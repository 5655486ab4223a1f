"""Training-stack tests: optimizer/schedule builders, the mesh-sharded train step on
the 8-device virtual CPU platform (real data parallelism — the reference's DDP path
was dead code, train_tracking.py:63), the trainer epoch loop on synthetic data, and
orbax checkpoint save/resume + shape-checked partial load."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptt_tpu.config import cfg_from_yaml_file
from ptt_tpu.data.loader import DataLoader, default_collate
from ptt_tpu.data.synthetic import SyntheticTrackingDataset
from ptt_tpu.nn import build_network
from ptt_tpu.train import Trainer, build_optimizer_and_schedule, checkpoint, create_train_state
from ptt_tpu.train.train_state import make_data_mesh, make_sharded_train_step, shard_batch
from ptt_tpu.utils import create_logger

pytestmark = pytest.mark.slow  # trainer epoch loops + grad-graph compiles (~18 min total on 1 CPU)


@pytest.fixture(scope="module")
def kitti_cfg():
    return cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")


@pytest.fixture(scope="module")
def synth_loader(kitti_cfg):
    ds_cfg = dict(kitti_cfg.DATA_CONFIG)
    ds_cfg.update(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=3,
        FRAMES_PER_TRACKLET=6,
        NUM_CANDIDATES_PERFRAME=2,
    )
    ds = SyntheticTrackingDataset(ds_cfg, ["Car"], training=True)
    return DataLoader(
        ds, batch_size=8, shuffle=True, drop_last=True,
        collate_fn=default_collate, num_workers=2, seed=0,
    )


def test_step_lr_schedule(kitti_cfg):
    tx, sched = build_optimizer_and_schedule(kitti_cfg.OPTIMIZATION, iters_per_epoch=10, total_epochs=60)
    # StepLR(12, 0.2): lr drops by 5x at epochs 12, 24, ...
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(11 * 10)) == pytest.approx(1e-3)
    assert float(sched(12 * 10)) == pytest.approx(2e-4)
    assert float(sched(24 * 10)) == pytest.approx(4e-5)


def test_onecycle_schedule():
    cfg = {"OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.0, "PCT_START": 0.4}
    _, sched = build_optimizer_and_schedule(cfg, iters_per_epoch=10, total_epochs=10)
    peak = max(float(sched(i)) for i in range(100))
    assert peak == pytest.approx(0.01, rel=1e-3)
    assert float(sched(0)) < peak  # warmup starts below peak
    assert float(sched(99)) < float(sched(40))  # anneals down after pct_start


@pytest.mark.parametrize("name", ["adam", "adamw", "sgd", "adam_onecycle"])
def test_all_optimizers_build_and_step(name):
    cfg = {"OPTIMIZER": name, "LR": 1e-3, "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10}
    tx, _ = build_optimizer_and_schedule(cfg, iters_per_epoch=5, total_epochs=2)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((3,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((3,)), "b": jnp.ones((3,))}
    updates, _ = tx.update(grads, opt_state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_in_step_bn_momentum_matches_post_hoc_rescale(kitti_cfg, synth_loader):
    """The BN-momentum correction fused into the compiled step (train_state.py)
    must equal the original two-pass host approach (copy stats -> step ->
    rescale_batch_stats), which is itself oracle-tested in test_processor_bn."""
    from ptt_tpu.train.bn_momentum import rescale_batch_stats
    from ptt_tpu.train.train_state import make_train_step

    model = build_network(kitti_cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(kitti_cfg.OPTIMIZATION, 10, 2)
    batch = next(iter(synth_loader))
    state = create_train_state(model, tx, batch, rng=jax.random.PRNGKey(0))

    target = 1.0 - 0.25  # flax momentum for a scheduled torch momentum of 0.25
    plain_step = jax.jit(make_train_step(kitti_cfg.MODEL))
    bn_step = jax.jit(make_train_step(kitti_cfg.MODEL, with_bn_momentum=True))

    fused_state, _ = bn_step(state, batch, jnp.float32(target))
    raw_state, _ = plain_step(state, batch)
    expected = rescale_batch_stats(state.batch_stats, raw_state.batch_stats, target)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        fused_state.batch_stats,
        expected,
    )
    # params are untouched by the correction
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        fused_state.params,
        raw_state.params,
    )


def test_mixed_precision_train_step(kitti_cfg, synth_loader):
    """OPTIMIZATION.MIXED_PRECISION (the bf16 analog of the reference's fp16
    FastAIMixedOptim): master params stay f32, the compiled forward/backward runs
    bf16, and the resulting update tracks the full-precision step closely."""
    from ptt_tpu.train.train_state import make_train_step

    model = build_network(kitti_cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(kitti_cfg.OPTIMIZATION, 10, 2)
    batch = next(iter(synth_loader))
    state = create_train_state(model, tx, batch, rng=jax.random.PRNGKey(0))

    f32_step = jax.jit(make_train_step(kitti_cfg.MODEL))
    bf16_step = jax.jit(make_train_step(kitti_cfg.MODEL, mixed_precision=True))

    s_bf, m_bf = bf16_step(state, batch)
    s_f32, m_f32 = f32_step(state, batch)

    # master weights and optimizer state remain float32
    for leaf in jax.tree_util.tree_leaves(s_bf.params):
        assert leaf.dtype == jnp.float32
    assert np.isfinite(float(m_bf["loss"]))
    # bf16 has ~3 decimal digits; losses should agree to bf16 resolution
    assert float(m_bf["loss"]) == pytest.approx(float(m_f32["loss"]), rel=0.05)


def test_sharded_train_step_on_mesh(kitti_cfg, synth_loader):
    """The jitted train step must shard the batch over all 8 virtual devices and
    produce replicated state + finite metrics."""
    mesh = make_data_mesh()
    assert mesh.devices.size == 8, "conftest should force 8 virtual CPU devices"
    batch = next(iter(synth_loader))
    model = build_network(kitti_cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(kitti_cfg.OPTIMIZATION, 10, 2)
    state = create_train_state(model, tx, batch)
    step = make_sharded_train_step(kitti_cfg.MODEL, mesh)
    sharded = shard_batch(batch, mesh)
    # batch dim (8) split across 8 devices
    assert len(sharded["search_points"].sharding.device_set) == 8
    state2, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params come back replicated (single logical value on every device)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_trainer_loss_decreases_and_resumes(kitti_cfg, synth_loader, tmp_path):
    cfg = kitti_cfg.copy()
    cfg.OPTIMIZATION["NUM_EPOCHS"] = 3
    model = build_network(cfg.MODEL)
    logger = create_logger()
    trainer = Trainer(
        model, cfg.MODEL, cfg.OPTIMIZATION, synth_loader, tmp_path, logger,
        ckpt_save_interval=1, max_ckpt_save_num=2,
    )
    first_batch = next(iter(synth_loader))
    step = make_sharded_train_step(cfg.MODEL, trainer.mesh)

    def eval_loss(state):
        # the sharded step donates its input state; probe on a copy
        state_copy = jax.tree_util.tree_map(jnp.copy, state)
        _, metrics = step(state_copy, shard_batch(first_batch, trainer.mesh))
        return float(metrics["loss"])

    loss_before = eval_loss(trainer.state)
    state = trainer.train()
    loss_after = eval_loss(state)
    assert loss_after < loss_before, f"{loss_after} !< {loss_before}"

    # rolling retention: only the 2 newest epochs kept
    kept = sorted(int(p.name) for p in (tmp_path / "ckpt").iterdir() if p.name.isdigit())
    assert kept == [2, 3]

    # resume restores the exact step counter and parameters
    trainer2 = Trainer(
        model, cfg.MODEL, cfg.OPTIMIZATION, synth_loader, tmp_path, logger,
    )
    trainer2.resume()
    assert trainer2.start_epoch == 3
    assert int(trainer2.state.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_partial_load_shape_checked(kitti_cfg, tmp_path, synth_loader):
    """PTT checkpoint loaded into the P2B variant: transformer weights are absent in
    the target, shared trunk weights transfer (reference tracker3d_template.py:110)."""
    batch = next(iter(synth_loader))
    ptt = build_network(kitti_cfg.MODEL)
    v_ptt = jax.jit(lambda b: ptt.init(jax.random.PRNGKey(0), b, train=False))(batch)
    ckpt_path = tmp_path / "model_ckpt"
    checkpoint.save_variables(ckpt_path, v_ptt["params"], v_ptt.get("batch_stats", {}))

    p2b_cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/p2b.yaml")
    p2b = build_network(p2b_cfg.MODEL)
    v_p2b = jax.jit(lambda b: p2b.init(jax.random.PRNGKey(1), b, train=False))(batch)
    params, batch_stats = checkpoint.load_params_from_file(
        ckpt_path, v_p2b["params"], v_p2b.get("batch_stats", {})
    )
    # a shared trunk tensor must now equal the PTT value
    src = v_ptt["params"]["backbone_3d"]
    dst = params["backbone_3d"]
    s_leaves = jax.tree_util.tree_leaves(src)
    d_leaves = jax.tree_util.tree_leaves(dst)
    assert all(np.allclose(np.asarray(s), np.asarray(d)) for s, d in zip(s_leaves, d_leaves))
    # and the result still runs
    out = jax.jit(lambda v, b: p2b.apply(v, b, train=False))(
        {"params": params, "batch_stats": batch_stats}, batch
    )
    assert np.isfinite(np.asarray(out["pred_box_data"])).all()


def test_trainer_with_bn_scheduler(kitti_cfg, synth_loader, tmp_path):
    """BN momentum schedule enabled end-to-end: one epoch trains, stats stay finite
    and move from init."""
    cfg = kitti_cfg.copy()
    cfg.OPTIMIZATION = dict(cfg.OPTIMIZATION)
    cfg.OPTIMIZATION["NUM_EPOCHS"] = 1
    cfg.OPTIMIZATION["BN_SCHEDULER"] = {"BN_INIT": 0.5, "BN_DECAY": 0.5, "DECAY_STEP": 20}
    model = build_network(cfg.MODEL)
    trainer = Trainer(
        model, cfg.MODEL, cfg.OPTIMIZATION, synth_loader, tmp_path, create_logger(),
    )
    init_stats = jax.tree_util.tree_leaves(trainer.state.batch_stats)[0].copy()
    state = trainer.train()
    leaf = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    assert not np.allclose(np.asarray(leaf), np.asarray(init_stats))


def test_trainer_saves_best_checkpoint(kitti_cfg, synth_loader, tmp_path):
    """The best-Success model survives outside the rolling ckpt window."""
    cfg = kitti_cfg.copy()
    cfg.OPTIMIZATION = dict(cfg.OPTIMIZATION)
    cfg.OPTIMIZATION["NUM_EPOCHS"] = 3
    model = build_network(cfg.MODEL)
    scores = iter([10.0, 30.0, 20.0])

    def fake_eval(state, epoch):
        return {"succ": next(scores), "prec": 50.0}

    trainer = Trainer(
        model, cfg.MODEL, cfg.OPTIMIZATION, synth_loader, tmp_path, create_logger(),
        eval_fn=fake_eval,
    )
    trainer.train()
    assert (tmp_path / "ckpt_best").exists()
    import json

    meta = json.loads((tmp_path / "ckpt_best.meta.json").read_text())
    assert meta["epoch"] == 2 and meta["succ"] == 30.0  # not overwritten by epoch 3


def test_multi_step_matches_sequential(kitti_cfg, synth_loader):
    """STEPS_PER_DISPATCH: one K-step scan dispatch must be EXACTLY K sequential
    single steps — same params, same per-step metrics."""
    from ptt_tpu.train.train_state import (
        make_sharded_multi_step,
        stack_shard_batches,
    )

    mesh = make_data_mesh()
    it = iter(synth_loader)
    batches = [next(it) for _ in range(3)]
    model = build_network(kitti_cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(kitti_cfg.OPTIMIZATION, 10, 2)

    state_a = create_train_state(model, tx, batches[0])
    step = make_sharded_train_step(kitti_cfg.MODEL, mesh)
    seq_losses = []
    for b in batches:
        state_a, m = step(state_a, shard_batch(b, mesh))
        seq_losses.append(float(m["loss"]))

    state_b = create_train_state(model, tx, batches[0])
    multi = make_sharded_multi_step(kitti_cfg.MODEL, mesh, k=3)
    state_b, mm = multi(state_b, stack_shard_batches(batches, mesh))
    np.testing.assert_allclose(np.asarray(mm["loss"]), seq_losses, rtol=1e-5)
    assert int(state_b.step) == int(state_a.step) == 3
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
    # BN running stats advanced identically too
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                      jax.tree_util.tree_leaves(state_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_trainer_steps_per_dispatch(kitti_cfg, synth_loader, tmp_path):
    """Trainer end-to-end at STEPS_PER_DISPATCH=2 over an odd iteration count:
    full groups take the scan dispatch, the tail takes the single step, and the
    iteration accounting stays exact."""
    cfg = kitti_cfg.copy()
    cfg.OPTIMIZATION["NUM_EPOCHS"] = 1
    cfg.OPTIMIZATION["STEPS_PER_DISPATCH"] = 2
    model = build_network(cfg.MODEL)
    logger = create_logger()
    trainer = Trainer(
        model, cfg.MODEL, cfg.OPTIMIZATION, synth_loader, tmp_path, logger,
        ckpt_save_interval=1,
    )
    n_iters = len(synth_loader)
    trainer.train()
    assert trainer.accumulated_iter == n_iters
    assert int(trainer.state.step) == n_iters


def test_sharded_train_step_lower_surface(kitti_cfg, synth_loader):
    """tools/train_bench.py AOT-lowers the sharded step for cost_analysis; the
    mesh-scoped wrapper must keep that surface working (round-5 regression: the
    round-4 wrapper dropped .lower and the next bench run would have crashed)."""
    mesh = make_data_mesh()
    batch = next(iter(synth_loader))
    model = build_network(kitti_cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(kitti_cfg.OPTIMIZATION, 10, 2)
    state = create_train_state(model, tx, batch)
    step = make_sharded_train_step(kitti_cfg.MODEL, mesh)
    compiled = step.lower(state, shard_batch(batch, mesh)).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    assert float(costs.get("flops", 0.0)) > 0.0
