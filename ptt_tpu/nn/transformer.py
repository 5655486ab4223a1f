"""Point-transformer attention blocks — the full 9-variant registry of the reference
(ptt/models/transformer_block/__init__.py:7-17, variants.py, multitransformer.py).

The workhorse (default config) is ``TransformerBlock``: Point-Transformer *vector*
attention over a kNN neighborhood — per-channel attention logits
``fc_gamma(q - k + delta)`` softmaxed over the k neighbors, with positional encoding
``delta = fc_delta(xi - xj)`` added to the values.  On TPU the kNN gather is a batched
take_along_axis and every projection is an MXU matmul over the 128-seed axis; N=128,
k=16, d=512 keeps the whole block VMEM-resident.

All blocks return ``(features_out, attn)`` like the reference. The stray debug prints
in the reference's ``TransformerBlockBackbone`` (variants.py:283,286) are deliberately
not reproduced.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from .layers import Linear, MLP2


def _knn_gather(x, idx):
    """(B, N, C) gathered at (B, M, K) -> (B, M, K, C)."""
    return ops.group_points(x, idx)


class TransformerBlock(nn.Module):
    """kNN vector attention (reference variants.py:127-165; Point-Transformer style)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        knn_idx = ops.knn(self.k, xyz, xyz)  # (B, N, k)
        knn_xyz = _knn_gather(xyz, knn_idx)

        pre = features
        x = Linear(self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(x), knn_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(x), knn_idx)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz[:, :, None] - knn_xyz)

        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(q[:, :, None] - k + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)  # over the k neighbors

        res = jnp.einsum("bmkf,bmkf->bmf", attn, v + pos_enc)
        res = Linear(self.d_points, name="fc2")(res) + pre
        return res, attn


class TransformerBlockSTD(nn.Module):
    """Global scalar QK^T attention (reference variants.py:12-40)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        pre = features
        x = Linear(self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = Linear(self.d_model, use_bias=False, name="w_ks")(x)
        v = Linear(self.d_model, use_bias=False, name="w_vs")(x)

        attn = jnp.einsum("bnf,bmf->bnm", q, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-1)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz)
        res = jnp.einsum("bnm,bmf->bnf", attn, v + pos_enc)
        res = Linear(self.d_points, name="fc2")(res) + pre
        return res, attn


class TransformerBlockALL(nn.Module):
    """Pointwise (no neighborhood) vector attention (reference variants.py:91-124)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        pre = features
        x = Linear(self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = Linear(self.d_model, use_bias=False, name="w_ks")(x)
        v = Linear(self.d_model, use_bias=False, name="w_vs")(x)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz)
        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(q - k + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)
        res = attn * (v + pos_enc)
        res = Linear(self.d_points, name="fc2")(res) + pre
        return res, attn


class TransformerBlockCosine(nn.Module):
    """kNN vector attention with an extra cosine-similarity channel folded into the
    relative q-k term (reference variants.py:43-88)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        knn_idx = ops.knn(self.k, xyz, xyz)
        knn_xyz = _knn_gather(xyz, knn_idx)

        pre = features
        x = Linear(self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(x), knn_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(x), knn_idx)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz[:, :, None] - knn_xyz)

        qk = q[:, :, None, :] * k
        sim = jnp.sum(qk, -1) / jnp.maximum(
            jnp.linalg.norm(q[:, :, None, :], axis=-1) * jnp.linalg.norm(k, axis=-1), 1e-8
        )
        rel = jnp.concatenate([sim[..., None], q[:, :, None] - k], axis=-1)
        rel = Linear(self.d_model, name="fc_sim")(rel)

        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(rel + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)
        res = jnp.einsum("bmkf,bmkf->bmf", attn, v + pos_enc)
        res = Linear(self.d_points, name="fc2")(res) + pre
        return res, attn


class TransformerBlockMLP(nn.Module):
    """TransformerBlock with 2-layer in/out projections (reference variants.py:211-253)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        knn_idx = ops.knn(self.k, xyz, xyz)
        knn_xyz = _knn_gather(xyz, knn_idx)

        pre = features
        x = MLP2(self.d_model, self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(x), knn_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(x), knn_idx)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz[:, :, None] - knn_xyz)
        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(q[:, :, None] - k + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)
        res = jnp.einsum("bmkf,bmkf->bmf", attn, v + pos_enc)
        res = MLP2(self.d_model, self.d_points, name="fc2")(res) + pre
        return res, attn


class TransformerBlockOffset(nn.Module):
    """TransformerBlock variant feeding (x - attended) through the output projection
    (reference variants.py:297-334)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        knn_idx = ops.knn(self.k, xyz, xyz)
        knn_xyz = _knn_gather(xyz, knn_idx)

        pre = features
        x = Linear(self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(x), knn_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(x), knn_idx)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz[:, :, None] - knn_xyz)
        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(q[:, :, None] - k + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)
        res = jnp.einsum("bmkf,bmkf->bmf", attn, v + pos_enc)
        res = Linear(self.d_points, name="fc2")(x - res) + pre
        return res, attn


class TransformerBlockBackbone(nn.Module):
    """Variant operating on precomputed grouped neighborhoods from an SA stage
    (reference variants.py:256-294, minus its stray debug prints).

    Call with (new_xyz (B, M, 3), grouped_xyz (B, M, ns, 3), grouped_idx (B, M, ns),
    features (B, N, C)); returns attended features (B, M, d_model) only, like the
    reference.
    """

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, new_xyz, grouped_xyz, grouped_idx, features, train: bool = False):
        x = Linear(self.d_model, name="fc1")(features)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(x), grouped_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(x), grouped_idx)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(
            new_xyz[:, :, None] - grouped_xyz
        )
        # NOTE: like the reference, this assumes N == M (queries are the centers).
        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(q[:, :, None] - k + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)
        out = jnp.einsum("bmkf,bmkf->bmf", attn, v + pos_enc)
        return out


class CrossAttentionBlock(nn.Module):
    """Template->search cross attention over search kNN (reference variants.py:168-208)."""

    d_points: int
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, search_feat, template_feat, train: bool = False):
        knn_idx = ops.knn(self.k, xyz, xyz)
        knn_xyz = _knn_gather(xyz, knn_idx)

        pre = search_feat
        fc1 = Linear(self.d_model, name="fc1")
        s = fc1(search_feat)
        t = fc1(template_feat)
        q = Linear(self.d_model, use_bias=False, name="w_qs")(t)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(s), knn_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(s), knn_idx)

        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz[:, :, None] - knn_xyz)
        attn = MLP2(self.d_model, self.d_model, name="fc_gamma")(q[:, :, None] - k + pos_enc)
        attn = nn.softmax(attn / np.sqrt(self.d_model), axis=-2)
        res = jnp.einsum("bmkf,bmkf->bmf", attn, v + pos_enc)
        res = Linear(self.d_points, name="fc3")(res) + pre
        return res, attn


class MulHeadTransformerLayer(nn.Module):
    """Multi-head kNN vector attention + LayerNorms (reference multitransformer.py:11-66)."""

    d_points: int
    d_model: int
    k: int
    heads: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        head_dim = self.d_model // self.heads
        knn_idx = ops.knn(self.k, xyz, xyz)
        knn_xyz = _knn_gather(xyz, knn_idx)

        pre = features
        x = Linear(self.d_model, name="fc1")(features)
        B, N, C = x.shape
        q = Linear(self.d_model, use_bias=False, name="w_qs")(x)
        k = _knn_gather(Linear(self.d_model, use_bias=False, name="w_ks")(x), knn_idx)
        v = _knn_gather(Linear(self.d_model, use_bias=False, name="w_vs")(x), knn_idx)
        pos_enc = MLP2(self.d_model, self.d_model, name="fc_delta")(xyz[:, :, None] - knn_xyz)

        # split heads: (B, N, K, H, hd) -> (B, H, N, K, hd)
        def split(t):
            return t.reshape(B, N, t.shape[2], self.heads, head_dim).transpose(0, 3, 1, 2, 4)

        qh = q.reshape(B, N, self.heads, head_dim).transpose(0, 2, 1, 3)
        kh, vh, ph = split(k), split(v), split(pos_enc)

        attn = MLP2(head_dim, head_dim, name="fc_gamma")(qh[:, :, :, None] - kh + ph)
        attn = nn.softmax(attn / np.sqrt(head_dim), axis=-2)
        res = jnp.einsum("bhmkf,bhmkf->bhmf", attn, vh + ph)
        res = res.transpose(0, 2, 1, 3).reshape(B, N, C)

        res = Linear(self.d_model, use_bias=False, name="proj")(res)
        res = nn.Dropout(self.drop, deterministic=not train)(res)
        res = nn.LayerNorm(name="norm1")(res)
        res = nn.LayerNorm(name="norm2")(Linear(self.d_points, name="fc2")(res)) + pre
        return res, attn


class MulTransformerBlock(nn.Module):
    """Stack of MulHeadTransformerLayer (reference multitransformer.py:69-77)."""

    d_points: int
    d_model: int
    k: int
    heads: int
    layers: int

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        out, attn = features, None
        for i in range(self.layers):
            out, attn = MulHeadTransformerLayer(
                self.d_points, self.d_model, self.k, self.heads, name=f"layer_{i}"
            )(xyz, out, train=train)
        return out, attn


ALL_TRANSFORMERS = {
    "MulTransformerBlock": MulTransformerBlock,
    "TransformerBlock": TransformerBlock,
    "TransformerBlockALL": TransformerBlockALL,
    "TransformerBlockBackbone": TransformerBlockBackbone,
    "TransformerBlockCosine": TransformerBlockCosine,
    "TransformerBlockMLP": TransformerBlockMLP,
    "TransformerBlockOffset": TransformerBlockOffset,
    "TransformerBlockSTD": TransformerBlockSTD,
    "CrossAttentionBlock": CrossAttentionBlock,
}


def build_transformer(cfg, name=None):
    """Registry constructor (reference transformer_block/__init__.py:20-27)."""
    cls = ALL_TRANSFORMERS[cfg["NAME"]]
    kwargs = dict(
        d_points=int(cfg["DIM_INPUT"]),
        d_model=int(cfg["DIM_MODEL"]),
        k=int(cfg["KNN"]),
    )
    if cls is MulTransformerBlock:
        kwargs.update(heads=int(cfg["N_HEADS"]), layers=int(cfg["N_LAYERS"]))
    if name is not None:
        kwargs["name"] = name
    return cls(**kwargs)
