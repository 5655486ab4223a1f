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


def per_layer_flops(model, variables, batch) -> list:
    """Per-LAYER parameter/FLOPs rows across the whole network — the direct analog
    of the reference's forward-hook walk (tracker3d_template.py:158-267), which
    registers hooks on every Conv/Linear/BN module and derives MACs from each
    module's captured output shape.

    Here the model runs once with ``capture_intermediates`` and each Dense /
    BatchNorm layer's output shape is read from the captured tree; FLOPs are the
    same analytic counts the reference uses (2 * out_positions * Cin * Cout for a
    pointwise Dense, 2 * out_elements for eval-mode BN). Like the reference's hook
    walk this covers the parametric layers only — non-parametric ops (softmax,
    kNN distances, max-pools) are in the exact per-stage XLA table instead
    (per_module_cost_analysis).

    Returns [(layer_path, {"params": n, "out_shape": tuple, "flops": f}), ...] in
    parameter-tree order.
    """
    from ..ops import pallas_sa

    # capture on the jnp (unfused) path: the fused SA kernel hides its MLP layers
    # inside one pallas_call, so their per-layer shapes only exist unfused
    prev = pallas_sa.DISABLE_FUSED
    pallas_sa.DISABLE_FUSED = True
    try:
        # jit: eager apply dispatches thousands of tiny ops (minutes on a
        # tunnel-attached device); one compiled call is seconds
        _, state = jax.jit(
            lambda v, b: model.apply(
                v, b, train=False,
                capture_intermediates=True, mutable=["intermediates"],
            )
        )(variables, batch)
    finally:
        pallas_sa.DISABLE_FUSED = prev

    def path_names(key_path):
        names = []
        for k in key_path:
            if hasattr(k, "key"):
                names.append(str(k.key))
            elif hasattr(k, "idx"):
                names.append(str(k.idx))
            else:
                names.append(str(k))
        return names

    # module path -> list of captured __call__ output shapes. A module may be
    # called several times per forward (Siamese branches share backbone weights;
    # the fused-SA path adds a (1, 1, 1, C) parameter-binding call) — like the
    # reference's hooks, FLOPs accumulate over every call.
    out_shapes = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(
        state["intermediates"]
    )[0]:
        names = path_names(key_path)
        if "__call__" in names and hasattr(leaf, "shape"):
            out_shapes.setdefault(
                tuple(names[: names.index("__call__")]), []
            ).append(tuple(leaf.shape))

    # walk parametric leaves of the param tree in order
    rows = []
    seen = set()
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(
        variables["params"]
    )[0]:
        names = path_names(key_path)
        mod_path, leaf_name = tuple(names[:-1]), names[-1]
        if mod_path in seen:
            continue
        shapes = out_shapes.get(mod_path, [])
        # display the biggest call's shape; flops sum over all calls
        out_shape = max(shapes, key=lambda s: int(np.prod(s)), default=None)
        if leaf_name == "kernel" and np.ndim(leaf) == 2:  # Dense
            seen.add(mod_path)
            cin, cout = leaf.shape
            positions = sum(int(np.prod(s[:-1])) for s in shapes)
            rows.append(
                ("/".join(mod_path),
                 {"params": int(cin * cout), "out_shape": out_shape,
                  "calls": len(shapes), "flops": 2.0 * positions * cin * cout,
                  "kind": "Dense"})
            )
        elif leaf_name == "scale":  # BatchNorm
            seen.add(mod_path)
            out_elems = sum(int(np.prod(s)) for s in shapes)
            rows.append(
                ("/".join(mod_path),
                 {"params": int(2 * np.size(leaf)), "out_shape": out_shape,
                  "calls": len(shapes), "flops": 2.0 * out_elems,
                  "kind": "BatchNorm"})
            )
    # fold bias params into their Dense rows
    bias_counts = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(
        variables["params"]
    )[0]:
        names = path_names(key_path)
        if names[-1] == "bias":
            bias_counts["/".join(names[:-1])] = int(np.size(leaf))
    for name, info in rows:
        if info["kind"] == "Dense" and name in bias_counts:
            info["params"] += bias_counts[name]
    return rows


def format_layer_table(rows) -> str:
    """Render per-layer rows like the reference's PrettyTable FLOPs report."""
    headers = ("Layer", "Type", "Output shape", "Calls", "Params", "MFLOPs")
    body = [
        (
            name,
            info["kind"],
            "x".join(map(str, info["out_shape"])) if info["out_shape"] else "?",
            info.get("calls", 1),
            f"{info['params']:,}",
            f"{info['flops'] / 1e6:.2f}",
        )
        for name, info in rows
    ]
    total = (
        "TOTAL", "", "", "",
        f"{sum(i['params'] for _, i in rows):,}",
        f"{sum(i['flops'] for _, i in rows) / 1e6:.2f}",
    )
    lines = [headers] + body + [total]
    widths = [max(len(str(r[i])) for r in lines) for i in range(len(headers))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def fmt(row):
        return "| " + " | ".join(str(v).ljust(w) for v, w in zip(row, widths)) + " |"

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
