"""Value-level parity of the adam_onecycle stack vs the reference fastai code.

Two oracles, both loaded from the reference tree (read-only):
  1. the OneCycle scheduler run on a FakeOptim (the reference's own test harness,
     learning_schedules_fastai.py:92-114) — pins the LR *and momentum* curves;
  2. the full OptimWrapper(Adam) + OneCycle loop on real torch parameters — pins
     true-wd/bn-split/momentum-annealing end to end against the optax chain.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE_ROOT.exists(), reason="reference tree not mounted"
)


def _load_ref_optimization():
    """Import the reference optimization package as `refopt.*` (its fastai_optim
    uses the pre-3.10 `from collections import Iterable`, patched around here)."""
    if "refopt.learning_schedules_fastai" in sys.modules:
        return (
            sys.modules["refopt.learning_schedules_fastai"],
            sys.modules["refopt.fastai_optim"],
        )
    import collections
    import collections.abc
    import importlib.util

    had_iterable = hasattr(collections, "Iterable")
    if not had_iterable:
        collections.Iterable = collections.abc.Iterable
    try:
        pkg_dir = REFERENCE_ROOT / "tools/train_utils/optimization"
        pkg = types.ModuleType("refopt")
        pkg.__path__ = [str(pkg_dir)]
        sys.modules["refopt"] = pkg
        mods = {}
        for name in ["fastai_optim", "learning_schedules_fastai"]:
            spec = importlib.util.spec_from_file_location(
                f"refopt.{name}", pkg_dir / f"{name}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refopt.{name}"] = mod
            spec.loader.exec_module(mod)
            mods[name] = mod
    finally:
        if not had_iterable and hasattr(collections, "Iterable"):
            del collections.Iterable
    return mods["learning_schedules_fastai"], mods["fastai_optim"]


TOTAL, LR_MAX, MOMS, DIV, PCT = 120, 3e-3, (0.95, 0.85), 10.0, 0.4


def test_onecycle_lr_and_momentum_curves_match_reference():
    lsf, _ = _load_ref_optimization()
    from ptt_tpu.train.optim import fastai_onecycle_schedules

    opt = lsf.FakeOptim()
    sched = lsf.OneCycle(opt, TOTAL, LR_MAX, list(MOMS), DIV, PCT)
    lr_fn, mom_fn = fastai_onecycle_schedules(TOTAL, LR_MAX, MOMS, DIV, PCT)

    # the jnp schedules compute in float32 (they run inside the jitted update);
    # near the annealed tail (lr -> lr_max/div/1e4) the cosine difference cancels
    # catastrophically, so allow f32-level relative error
    for step in range(TOTAL):
        sched.step(step)
        np.testing.assert_allclose(float(lr_fn(step)), opt.lr, rtol=1e-4, atol=1e-10)
        np.testing.assert_allclose(float(mom_fn(step)), opt.mom, rtol=1e-4, atol=1e-10)


def test_adam_onecycle_parameter_trajectory_matches_torch():
    """Run N real update steps on identical params/grads through (a) the reference
    OptimWrapper(Adam, true_wd, bn_wd) + OneCycle and (b) the optax chain built by
    build_optimizer_and_schedule, and compare the parameter values."""
    import jax.numpy as jnp
    import torch
    import torch.nn as nn

    lsf, fao = _load_ref_optimization()
    from ptt_tpu.train.optim import build_optimizer_and_schedule

    steps, wd, clip = 25, 0.01, 10.0
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((8, 4)).astype(np.float32)
    b0 = rng.standard_normal((4,)).astype(np.float32)
    gamma0 = rng.standard_normal((4,)).astype(np.float32)  # a BN-like param
    grads_seq = [
        {
            "w": rng.standard_normal((8, 4)).astype(np.float32),
            "b": rng.standard_normal((4,)).astype(np.float32),
            "gamma": rng.standard_normal((4,)).astype(np.float32),
        }
        for _ in range(steps)
    ]

    # ---- torch reference: Linear (weight+bias) + BatchNorm1d (so split_bn_bias
    # actually splits) wrapped exactly like optimization/__init__.py:23-35
    lin = nn.Linear(8, 4)
    bn = nn.BatchNorm1d(4, affine=True)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w0.T))  # torch Linear stores (out, in)
        lin.bias.copy_(torch.from_numpy(b0))
        bn.weight.copy_(torch.from_numpy(gamma0))
        bn.bias.zero_()
    model = nn.Sequential(lin, bn)
    from functools import partial

    opt = fao.OptimWrapper.create(
        partial(torch.optim.Adam, betas=(0.9, 0.99)),
        3e-3,
        [model],
        wd=wd,
        true_wd=True,
        bn_wd=True,
    )
    sched = lsf.OneCycle(opt, TOTAL, LR_MAX, list(MOMS), DIV, PCT)
    for k in range(steps):
        sched.step(k)
        opt.zero_grad()
        lin.weight.grad = torch.from_numpy(grads_seq[k]["w"].T.copy())
        lin.bias.grad = torch.from_numpy(grads_seq[k]["b"].copy())
        bn.weight.grad = torch.from_numpy(grads_seq[k]["gamma"].copy())
        bn.bias.grad = torch.zeros(4)
        torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()

    # ---- optax twin
    cfg = {
        "OPTIMIZER": "adam_onecycle",
        "LR": LR_MAX,
        "WEIGHT_DECAY": wd,
        "MOMS": list(MOMS),
        "DIV_FACTOR": DIV,
        "PCT_START": PCT,
        "GRAD_NORM_CLIP": clip,
    }
    tx, _ = build_optimizer_and_schedule(cfg, iters_per_epoch=TOTAL, total_epochs=1)
    params = {
        "w": jnp.asarray(w0),
        "b": jnp.asarray(b0),
        "gamma": jnp.asarray(gamma0),
        "beta": jnp.zeros(4),
    }
    state = tx.init(params)
    import optax

    for k in range(steps):
        g = {
            "w": jnp.asarray(grads_seq[k]["w"]),
            "b": jnp.asarray(grads_seq[k]["b"]),
            "gamma": jnp.asarray(grads_seq[k]["gamma"]),
            "beta": jnp.zeros(4),
        }
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), lin.weight.detach().numpy().T, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["b"]), lin.bias.detach().numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["gamma"]), bn.weight.detach().numpy(), rtol=1e-4, atol=1e-6
    )
