"""P2B cosine-similarity feature augmentation (reference CosineSimAug,
ptt/models/similarity_modules/p2b_xcoor.py:9-46).

Builds, for every (template seed i, search seed j) pair, the fused descriptor
[cos_sim(f_i, f_j) | template_xyz_i | template_feats_i] (1+3+256 = 260 channels),
runs the shared MLP over all pairs, max-pools over the template axis, and projects —
embedding template evidence into each search seed's feature.

TPU note: the pairwise tensor is (B, 64, 128, 260) channel-last; the cosine matrix is
one fp32 MXU matmul of L2-normalized features, and the pairwise MLP is a large, dense,
perfectly-shaped batched matmul — exactly what the systolic array wants.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import ConvStack, SharedMLP


class CosineSimAug(nn.Module):
    model_cfg: dict

    @nn.compact
    def __call__(self, batch, train: bool = False):
        out = dict(batch)
        search_feats = batch["search_feats"]  # (B, n2, C)
        template_feats = batch["template_feats"]  # (B, n1, C)
        template_xyz = batch["template_seeds"]  # (B, n1, 3)
        B, n1, C = template_feats.shape
        n2 = search_feats.shape[1]

        t_norm = template_feats / jnp.maximum(
            jnp.linalg.norm(template_feats, axis=-1, keepdims=True), 1e-8
        )
        s_norm = search_feats / jnp.maximum(
            jnp.linalg.norm(search_feats, axis=-1, keepdims=True), 1e-8
        )
        sim = jnp.einsum(
            "bic,bjc->bij", t_norm, s_norm,
            preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
        )  # (B, n1, n2)

        # Layer 0 of the pairwise MLP is linear over [sim | xyz_i | feats_i], and
        # only the 1-channel sim term varies with the search index j — so instead
        # of materializing the (B, n1, n2, 260) concat and matmuling it (the
        # reference's path, p2b_xcoor.py:36-44), split the layer-0 kernel: the
        # (xyz|feats) rows project once per template seed ((B, n1, C1), a 260x
        # smaller matmul), and the sim row is a broadcast outer product. Exact
        # same function, ~99% fewer layer-0 FLOPs, no 260-wide pairwise tensor
        # in HBM; BN/ReLU and all later layers see identical activations.
        def first_linear(kernel):  # (1+3+C, C1) = Dense_0's kernel
            proj_t = jnp.concatenate([template_xyz, template_feats], axis=-1) @ kernel[1:]
            return sim[..., None] * kernel[0] + proj_t[:, :, None, :]

        mlp = SharedMLP(self.model_cfg["MLP"]["CHANNELS"], bn=self.model_cfg["MLP"]["BN"])
        if mlp.bn:
            fused = mlp(None, train=train, first_linear_apply=first_linear)
        else:
            # BN:False keeps a layer-0 bias the decomposed hook doesn't carry —
            # take the reference-shaped concat path (identical function, just
            # without the FLOP/HBM saving)
            fused = jnp.concatenate(
                [
                    sim[..., None],
                    jnp.broadcast_to(template_xyz[:, :, None, :], (B, n1, n2, 3)),
                    jnp.broadcast_to(template_feats[:, :, None, :], (B, n1, n2, C)),
                ],
                axis=-1,
            )
            fused = mlp(fused, train=train)
        fused = jnp.max(fused, axis=1)  # max-pool over the template axis -> (B, n2, C')
        fused = ConvStack(self.model_cfg["CONV"]["CHANNELS"], bn=self.model_cfg["CONV"]["BN"])(
            fused, train=train
        )
        out["cosine_feats"] = fused
        return out
