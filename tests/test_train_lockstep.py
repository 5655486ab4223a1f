"""Lockstep training-dynamics parity vs the reference PyTorch stack.

Round-3 verdict item 3: loss values were oracle-matched only at step 0 and
schedule values only in isolation (test_optim_parity). This test trains BOTH
stacks from identical converted weights on identical synthetic batches with the
shipped PTT recipe (plain Adam betas=(0.5, 0.999) eps=1e-6 wd=0 + global-norm
clip 10, ptt.yaml OPTIMIZATION; reference loop train_utils.py:10-77) and pins
the whole loss trajectory — optimizer math, BN train-mode batch stats, loss
stack, and every gradient path (the index ops are shared bit-exact C++ oracles,
so backward flows through identical gathers on both sides).

f32 end-to-end; the trajectories drift only by accumulation order, so the
tolerance can stay tight for a meaningful horizon (20 steps).
"""

import numpy as np
import pytest

from tests.ref_oracle import (
    load_reference_model,
    reference_available,
    reference_forward_runnable,
)

pytestmark = [
    pytest.mark.slow,  # ~650 s: 20 torch+jax lockstep train steps
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not mounted"
    ),
]

N_STEPS = 20
B = 8


def _make_batches(n_steps, b, rng):
    """Fixed synthetic per-step batches (numpy f32) shared by both stacks."""
    out = []
    for _ in range(n_steps):
        out.append(
            {
                "search_points": rng.standard_normal((b, 1024, 3)).astype(np.float32),
                "template_points": rng.standard_normal((b, 512, 3)).astype(np.float32),
                "cls_label": (rng.random((b, 1024)) > 0.7).astype(np.float32),
                "reg_label": (rng.standard_normal((b, 4)) * 0.3).astype(np.float32),
            }
        )
    return out


def _torch_trajectory(model, batches, optim_cfg):
    """Reference side: model.train() forward -> loss.backward -> clip -> Adam step
    (train_utils.py:37-52 without the scheduler — StepLR(step_size=12 epochs)
    holds LR constant over any 20-iteration window)."""
    import torch

    optimizer = torch.optim.Adam(
        model.parameters(),
        lr=float(optim_cfg["LR"]),
        weight_decay=float(optim_cfg["WEIGHT_DECAY"]),
        betas=tuple(optim_cfg["BETAS"]),
        eps=float(optim_cfg["EPS"]),
    )
    model.train()
    losses = []
    for b in batches:
        optimizer.zero_grad()
        ret, _, _ = model(
            {
                "search_points": torch.from_numpy(b["search_points"].copy()),
                "template_points": torch.from_numpy(b["template_points"].copy()),
                "cls_label": torch.from_numpy(b["cls_label"].copy()),
                "reg_label": torch.from_numpy(b["reg_label"].copy()),
                "batch_size": b["search_points"].shape[0],
            }
        )
        loss = ret["loss"].mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            model.parameters(), float(optim_cfg["GRAD_NORM_CLIP"])
        )
        optimizer.step()
        losses.append(float(loss.detach()))
    model.eval()
    return losses


def _jax_trajectory(init_state_dict, batches, cfg):
    import jax
    import jax.numpy as jnp

    from ptt_tpu.nn import build_network
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import make_train_step
    from ptt_tpu.utils.torch_converter import convert_state_dict

    model = build_network(cfg.MODEL)
    init_batch = {
        "search_points": jnp.zeros((B, 1024, 3)),
        "template_points": jnp.zeros((B, 512, 3)),
    }
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(init_batch)
    params, batch_stats, report = convert_state_dict(
        init_state_dict, variables["params"], variables["batch_stats"]
    )
    assert not report["missing"] and not report["unused"]

    # one "epoch" of N_STEPS iterations: StepLR(step_size=12 epochs) leaves the
    # LR at its base value for the whole window, like the torch side
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(batches), 1)
    state = create_train_state(
        model, tx, init_batch, params=params, batch_stats=batch_stats
    )
    step = jax.jit(make_train_step(cfg.MODEL))
    losses = []
    for b in batches:
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in b.items()})
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses


def test_lockstep_training_parity():
    if not reference_forward_runnable():
        pytest.skip("native oracles unavailable — cannot run reference forward")
    from ptt_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    batches = _make_batches(N_STEPS, B, np.random.default_rng(2024))

    # snapshot the initial weights FIRST: load_reference_model caches by key and
    # the torch trajectory optimizes the cached module in place, so the jax side
    # must convert from this pre-training copy, not from a fresh (mutated) load
    model, _ = load_reference_model(seed=11, cache_key="lockstep")
    init_state_dict = {k: v.detach().clone() for k, v in model.state_dict().items()}

    ref = _torch_trajectory(model, batches, cfg.OPTIMIZATION)
    mine = _jax_trajectory(init_state_dict, batches, cfg)

    assert len(ref) == len(mine) == N_STEPS
    # step 0 is pure forward parity (pre-update weights): tight
    assert mine[0] == pytest.approx(ref[0], rel=1e-4)
    # the full trajectory: f32 accumulation-order drift compounds through Adam's
    # elementwise nonlinearity, so allow growth but require agreement throughout
    rel = np.abs(np.asarray(mine) - np.asarray(ref)) / np.abs(np.asarray(ref))
    # measured: 2e-5 at step 0, ~3-5e-3 from step 2 on — early Adam steps divide
    # near-zero second moments, amplifying f32 reduction-order noise by ~30x in
    # one update; a real optimizer/BN mismatch diverges by orders instead
    assert rel[:5].max() < 1e-2, f"early trajectory diverged: {rel[:5]}"
    assert rel.max() < 5e-2, f"trajectory diverged: step {rel.argmax()}, rel {rel.max()}"
    # and training must actually be learning on both sides (nontrivial test)
    assert mine[-1] < mine[0] and ref[-1] < ref[0]
