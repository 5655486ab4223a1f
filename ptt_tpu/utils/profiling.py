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


def per_module_cost_analysis(model_cfg, variables, batch) -> list:
    """Per-top-level-module XLA cost breakdown (the tpu analog of the reference's
    forward-hook FLOPs table, tracker3d_template.py:158-267).

    Each stage of the PTT pipeline (backbone / similarity / centroid head /
    box head) is compiled standalone on its real captured input dict — the stage
    params are exactly the corresponding subtree of ``variables`` because the
    tracker names its submodules — so the numbers are XLA's post-fusion cost of
    that stage, not an nn-layer estimate.

    Returns [(module_name, {"flops": ..., "bytes_accessed": ..., "params": n}), ...].
    """
    from ..nn.tracker import (
        ALL_BACKBONES,
        ALL_BOX_HEADS,
        ALL_CENTROID_HEADS,
        ALL_SIMILARITY,
    )

    stages = [
        ("backbone_3d",
         ALL_BACKBONES[model_cfg["BACKBONE_3D"]["NAME"]](model_cfg["BACKBONE_3D"],
                                                         input_channels=3)),
        ("similarity_module",
         ALL_SIMILARITY[model_cfg["SIMILARITY_MODULE"]["NAME"]](model_cfg["SIMILARITY_MODULE"])),
        ("centroid_voting_head",
         ALL_CENTROID_HEADS[model_cfg["CENTROID_HEAD"]["NAME"]](model_cfg["CENTROID_HEAD"])),
        ("box_voting_head",
         ALL_BOX_HEADS[model_cfg["BOX_HEAD"]["NAME"]](model_cfg["BOX_HEAD"])),
    ]
    rows = []
    out = dict(batch)
    for name, module in stages:
        stage_vars = {
            "params": variables["params"][name],
            "batch_stats": variables.get("batch_stats", {}).get(name, {}),
        }
        fn = lambda v, b: module.apply(v, b, train=False)  # noqa: B023
        costs = cost_analysis(fn, stage_vars, out)
        costs["params"] = count_parameters(stage_vars["params"])["total"]
        rows.append((name, costs))
        out = jax.jit(fn)(stage_vars, out)
    return rows


def format_cost_table(rows) -> str:
    """Render per-module costs as the reference's PrettyTable-style text block."""
    headers = ("Module", "Params", "MFLOPs", "MB accessed")
    body = [
        (
            name,
            f"{c['params']:,}",
            f"{c['flops'] / 1e6:.2f}",
            f"{c['bytes_accessed'] / 1e6:.2f}",
        )
        for name, c in rows
    ]
    total = (
        "TOTAL",
        f"{sum(c['params'] for _, c in rows):,}",
        f"{sum(c['flops'] for _, c in rows) / 1e6:.2f}",
        f"{sum(c['bytes_accessed'] for _, c in rows) / 1e6:.2f}",
    )
    lines = [headers] + body + [total]
    widths = [max(len(str(r[i])) for r in lines) for i in range(len(headers))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def fmt(row):
        return "| " + " | ".join(str(v).rjust(w) for v, w in zip(row, widths)) + " |"
    out = [sep, fmt(headers), sep]
    out += [fmt(r) for r in body]
    out += [sep, fmt(total), sep]
    return "\n".join(out)


@contextmanager
def trace(log_dir: str):
    """On-device profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
