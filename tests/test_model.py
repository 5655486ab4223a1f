"""Model-level tests: shapes through the full PTT pipeline, loss finiteness and
gradients, P2B config variant, and every transformer registry entry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptt_tpu.config import cfg_from_yaml_file
from ptt_tpu.nn import build_network, compute_losses
from ptt_tpu.nn.transformer import ALL_TRANSFORMERS, build_transformer


@pytest.fixture(scope="module")
def kitti_cfg():
    return cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")


def make_batch(B=2, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "search_points": jnp.array(rng.standard_normal((B, 1024, 3)).astype(np.float32)),
        "template_points": jnp.array(rng.standard_normal((B, 512, 3)).astype(np.float32)),
        "cls_label": jnp.array((rng.random((B, 1024)) > 0.7).astype(np.float32)),
        "reg_label": jnp.array(rng.standard_normal((B, 4)).astype(np.float32) * 0.3),
    }


@pytest.fixture(scope="module")
def model_and_vars(kitti_cfg):
    model = build_network(kitti_cfg.MODEL)
    batch = make_batch()
    # always init/apply under jit: eager tracing compiles thousands of tiny ops
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    B = 2
    assert out["search_seeds"].shape == (B, 128, 3)
    assert out["search_feats"].shape == (B, 128, 256)
    assert out["search_inds"].shape == (B, 128)
    assert out["template_seeds"].shape == (B, 64, 3)
    assert out["template_feats"].shape == (B, 64, 256)
    assert out["cosine_feats"].shape == (B, 128, 256)
    assert out["pred_centroids_cls"].shape == (B, 128)
    assert out["pred_centroids_votes"].shape == (B, 128, 3)
    assert out["votes_feats"].shape == (B, 128, 257)
    assert out["pred_box_center"].shape == (B, 64, 3)
    assert out["pred_box_data"].shape == (B, 64, 5)
    assert "search_points" not in out  # popped like the reference backbone
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_losses_finite_and_nonzero(kitti_cfg, model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    @jax.jit
    def run(v, b):
        out, _ = model.apply(v, b, train=True, mutable=["batch_stats"])
        return compute_losses(kitti_cfg.MODEL, out, b)

    loss, tb = run(variables, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("centroids_cls_loss", "centroids_reg_loss", "boxes_cls_loss", "boxes_reg_loss"):
        assert np.isfinite(float(tb[k]))


def test_gradients_flow(kitti_cfg, model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=True, mutable=["batch_stats"]
        )
        loss, _ = compute_losses(kitti_cfg.MODEL, out, batch)
        return loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves, "no gradient leaves"
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total) and total > 0
    # every top-level module must receive gradient
    for mod in ("backbone_3d", "similarity_module", "centroid_voting_head", "box_voting_head"):
        sub = jax.tree_util.tree_leaves(grads[mod])
        assert sum(float(jnp.sum(jnp.abs(g))) for g in sub) > 0, f"no grad into {mod}"


def test_p2b_variant_runs():
    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/p2b.yaml")
    assert cfg.MODEL.CENTROID_HEAD.TRANSFORMER_BLOCK.ENABLE is False
    model = build_network(cfg.MODEL)
    batch = make_batch()
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["pred_box_data"].shape == (2, 64, 5)
    # no transformer params present when disabled
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("transformer" in n for n in names)


@pytest.mark.parametrize("name", sorted(ALL_TRANSFORMERS))
def test_transformer_variants(name):
    if name in ("TransformerBlockBackbone", "CrossAttentionBlock"):
        pytest.skip("separate signatures, tested below")
    cfg = {"NAME": name, "DIM_INPUT": 32, "DIM_MODEL": 64, "KNN": 4, "N_HEADS": 2, "N_LAYERS": 2}
    block = build_transformer(cfg)
    rng = np.random.default_rng(0)
    xyz = jnp.array(rng.standard_normal((2, 16, 3)).astype(np.float32))
    feats = jnp.array(rng.standard_normal((2, 16, 32)).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), xyz, feats)
    out, attn = block.apply(variables, xyz, feats)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cross_attention_block():
    cfg = {"NAME": "CrossAttentionBlock", "DIM_INPUT": 32, "DIM_MODEL": 64, "KNN": 4}
    block = build_transformer(cfg)
    rng = np.random.default_rng(0)
    xyz = jnp.array(rng.standard_normal((2, 16, 3)).astype(np.float32))
    s = jnp.array(rng.standard_normal((2, 16, 32)).astype(np.float32))
    t = jnp.array(rng.standard_normal((2, 16, 32)).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), xyz, s, t)
    out, _ = block.apply(variables, xyz, s, t)
    assert out.shape == s.shape


def test_backbone_transformer_block():
    cfg = {"NAME": "TransformerBlockBackbone", "DIM_INPUT": 32, "DIM_MODEL": 64, "KNN": 4}
    block = build_transformer(cfg)
    rng = np.random.default_rng(0)
    B, N, ns = 2, 16, 4
    new_xyz = jnp.array(rng.standard_normal((B, N, 3)).astype(np.float32))
    grouped_xyz = jnp.array(rng.standard_normal((B, N, ns, 3)).astype(np.float32))
    grouped_idx = jnp.array(rng.integers(0, N, (B, N, ns)).astype(np.int32))
    feats = jnp.array(rng.standard_normal((B, N, 32)).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), new_xyz, grouped_xyz, grouped_idx, feats)
    out = block.apply(variables, new_xyz, grouped_xyz, grouped_idx, feats)
    assert out.shape == (B, N, 64)


def test_forward_is_jittable(kitti_cfg, model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()

    @jax.jit
    def fwd(v, b):
        return model.apply(v, b, train=False)

    out1 = fwd(variables, batch)
    out2 = fwd(variables, batch)  # cached path
    np.testing.assert_allclose(
        np.asarray(out1["pred_box_data"]), np.asarray(out2["pred_box_data"]), rtol=1e-6
    )


def test_search_inds_compose_to_raw_indices(model_and_vars):
    """seeds must equal raw points gathered at the composed indices."""
    model, variables = model_and_vars
    batch = make_batch()
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    inds = np.asarray(out["search_inds"])
    seeds = np.asarray(out["search_seeds"])
    raw = np.asarray(batch["search_points"])
    for b in range(raw.shape[0]):
        np.testing.assert_allclose(seeds[b], raw[b][inds[b]], atol=1e-6)


def test_per_module_cost_analysis(kitti_cfg, model_and_vars):
    """Per-module FLOPs breakdown (reference calc_flops table): every pipeline
    stage reports positive post-fusion FLOPs, the stage outputs chain correctly,
    and the param split covers the whole model."""
    from ptt_tpu.utils.profiling import (
        count_parameters,
        format_cost_table,
        per_module_cost_analysis,
    )

    model, variables = model_and_vars
    batch = make_batch()
    eval_batch = {k: batch[k] for k in ("search_points", "template_points")}
    rows = per_module_cost_analysis(kitti_cfg.MODEL, variables, eval_batch)

    names = [n for n, _ in rows]
    assert names == [
        "backbone_3d", "similarity_module", "centroid_voting_head", "box_voting_head",
    ]
    for _, costs in rows:
        assert costs["flops"] > 0
        assert costs["params"] > 0
    total = count_parameters(variables["params"])["total"]
    assert sum(c["params"] for _, c in rows) == total

    table = format_cost_table(rows)
    assert "backbone_3d" in table and "TOTAL" in table


def test_similarity_layer0_decomposition_matches_naive(kitti_cfg, rng):
    """The similarity module's decomposed first MLP layer (outer-product sim term
    + once-per-template projection, nn/similarity.py round 4) must equal the
    naive path: materialize the (B, n1, n2, 260) concat and matmul it with the
    SAME Dense_0 kernel. Pins the refactor independently of the torch oracle."""
    import jax
    import jax.numpy as jnp

    from ptt_tpu.nn.similarity import CosineSimAug

    B, n1, n2, C = 2, 8, 16, 256
    mod = CosineSimAug(kitti_cfg.MODEL["SIMILARITY_MODULE"])
    batch = {
        "search_feats": jnp.asarray(rng.standard_normal((B, n2, C)), jnp.float32),
        "template_feats": jnp.asarray(rng.standard_normal((B, n1, C)), jnp.float32),
        "template_seeds": jnp.asarray(rng.standard_normal((B, n1, 3)), jnp.float32),
    }
    variables = mod.init(jax.random.PRNGKey(0), batch, train=False)
    out = mod.apply(variables, batch, train=False)["cosine_feats"]

    # naive reference with the same parameters
    p_mlp = variables["params"]["SharedMLP_0"]
    t = batch["template_feats"]
    s = batch["search_feats"]
    tn = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    sn = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("bic,bjc->bij", tn, sn,
                     precision=jax.lax.Precision.HIGHEST)
    fused = jnp.concatenate(
        [
            sim[..., None],
            jnp.broadcast_to(batch["template_seeds"][:, :, None, :], (B, n1, n2, 3)),
            jnp.broadcast_to(t[:, :, None, :], (B, n1, n2, C)),
        ],
        axis=-1,
    )
    x = fused @ p_mlp["Dense_0"]["kernel"]
    for i in range(3):
        if i:
            x = x @ p_mlp[f"Dense_{i}"]["kernel"]
        bn = variables["batch_stats"]["SharedMLP_0"][f"BatchNorm_{i}"]
        sc = p_mlp[f"BatchNorm_{i}"]
        x = (x - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * sc["scale"] + sc["bias"]
        x = jnp.maximum(x, 0.0)
    x = jnp.max(x, axis=1)

    # push the naive MLP output through the module's own ConvStack params
    from ptt_tpu.nn.layers import ConvStack

    conv = ConvStack(kitti_cfg.MODEL["SIMILARITY_MODULE"]["CONV"]["CHANNELS"],
                     bn=kitti_cfg.MODEL["SIMILARITY_MODULE"]["CONV"]["BN"])
    naive = conv.apply(
        {"params": variables["params"]["ConvStack_0"],
         "batch_stats": variables["batch_stats"]["ConvStack_0"]},
        x, train=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), atol=2e-4)
