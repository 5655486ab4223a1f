"""Profiling utilities (reference tracker3d_template.py:158-281 calc_flops /
count_parameters, done the XLA way).

The reference walks torch modules with forward hooks to estimate FLOPs; under XLA
the compiler itself reports exact per-program flops/bytes via ``cost_analysis()``,
which accounts for fusion — so these numbers are what the hardware actually runs,
not an nn-layer estimate. ``trace`` wraps ``jax.profiler`` for on-device timelines
(the analog of the reference's ad-hoc cuda-synchronized timers)."""

from __future__ import annotations

from contextlib import contextmanager

import jax
import numpy as np


def count_parameters(params) -> dict:
    """Total / per-top-level-module parameter counts."""
    total = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    per_module = {}
    if isinstance(params, dict):
        for name, sub in params.items():
            per_module[name] = int(
                sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(sub))
            )
    return {"total": int(total), "per_module": per_module}


def cost_analysis(fn, *example_args) -> dict:
    """Compile ``fn`` and return XLA's cost model for it: exact post-fusion flops,
    HBM traffic estimate, and peak memory if available."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    out = {
        "flops": float(costs.get("flops", -1.0)),
        "bytes_accessed": float(costs.get("bytes accessed", -1.0)),
    }
    try:
        out["peak_memory_bytes"] = int(compiled.memory_analysis().temp_size_in_bytes)
    except Exception:
        pass
    return out


@contextmanager
def trace(log_dir: str):
    """On-device profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
