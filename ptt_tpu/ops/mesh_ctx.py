"""Mesh context: makes the Pallas kernels survive multi-device meshes.

A ``pl.pallas_call`` inside a pjit program over a >1-device mesh has no
partitioning rule, so XLA cannot shard it — round 3 therefore disabled every
fused kernel under a mesh (ops/pallas_sa.py round-3 ``len(jax.devices())==1``
gate), silently losing the ~2x eval kernel and the 1.22x train kernel exactly
when the framework scales. All of this model family's kernels are
embarrassingly parallel over the batch axis (per-(tracklet|sample) ball query /
grouping / FPS — no cross-batch reduction), so the fix is mechanical: wrap each
kernel invocation in ``shard_map`` over the data axis, letting every device run
the identical grid program on its batch shard.

Kernels read the context at TRACE time through ``shard_batched``, so the
context must be correct whenever a consuming jit traces. The entry points that
own a mesh therefore SCOPE it around their own dispatches with ``use_mesh``
(train_state.make_sharded_train_step wraps every step call; the eval device
loop wraps each dispatch_batch with its own mesh-or-None) rather than leaking a
process-global — a meshless evaluator after a mesh-sharded training step keeps
its jnp fallback. Wrappers that carry their own jit additionally put (mesh,
axis) in their static arguments (fused_sa_inference, Pallas FPS) so a direct
caller under a different context retraces. Residual caveat, inherent to any
trace-time configuration: user code that jits a kernel-containing function
itself, traces it, and only then changes the context keeps the old trace —
enter ``use_mesh`` before the first call instead.

The reference has no analog (its CUDA kernels run under torch DDP's
one-process-per-GPU model, where every kernel is single-device by construction;
SURVEY.md §2.3) — this is the TPU-native equivalent of that property.
"""

from __future__ import annotations

import contextlib
import contextvars

from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 top-level API (check_vma kwarg); experimental path for older
    from jax import shard_map as _raw_shard_map

    def _shard_map(fn, mesh, in_specs, out_specs):
        return _raw_shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _raw_shard_map

    def _shard_map(fn, mesh, in_specs, out_specs):
        return _raw_shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


# ContextVar (not module globals) so two threads tracing concurrently — e.g. an
# async eval dispatch overlapping a train step — each see only their own scoped
# mesh and cannot bake the other's sharding into a cached trace.
_CTX: contextvars.ContextVar[tuple[Mesh | None, str]] = contextvars.ContextVar(
    "ptt_tpu_mesh_ctx", default=(None, "data")
)


def set_mesh(mesh: Mesh | None, axis: str = "data") -> None:
    """Install the context-level mesh the fused kernels shard over (None clears)."""
    _CTX.set((mesh, axis))


def get_mesh() -> tuple[Mesh | None, str]:
    """(mesh, axis) if a >1-device mesh is installed, else (None, axis) — a
    1-device mesh needs no shard_map and would only add tracing overhead."""
    mesh, axis = _CTX.get()
    if mesh is not None and mesh.size > 1:
        return mesh, axis
    return None, axis


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None, axis: str = "data"):
    token = _CTX.set((mesh, axis))
    try:
        yield
    finally:
        _CTX.reset(token)


# --------------------------------------------------------------------------
# Point-axis (sequence-parallel) context — the long-context analog (SURVEY.md
# §5): for Waymo-scale clouds the POINT dimension is the axis to shard. A 1D
# ('point',) mesh installed here makes ops.square_distance / ops.knn /
# ops.ball_query route their O(N^2) work through shard_map (query/center rows
# split over devices, reference points replicated — queries are independent, so
# no collectives inside the op). Installed by entry points that own the mesh
# (tools/test_tracking.py for POINT_SHARDING configs, dryrun_multichip), read
# by the ops dispatchers at trace time — the same trace-time contract as the
# batch context above.
_POINT_CTX: contextvars.ContextVar[tuple[Mesh | None, str]] = contextvars.ContextVar(
    "ptt_tpu_point_mesh_ctx", default=(None, "point")
)


def set_point_mesh(mesh: Mesh | None, axis: str = "point") -> None:
    """Install the context-level mesh the point-axis-sharded ops split over."""
    if mesh is not None and axis not in mesh.axis_names:
        raise ValueError(f"mesh axes {mesh.axis_names} have no '{axis}' axis")
    _POINT_CTX.set((mesh, axis))


def get_point_mesh() -> tuple[Mesh | None, str]:
    """(mesh, axis) if a point mesh with a >1-way point axis is installed."""
    mesh, axis = _POINT_CTX.get()
    if mesh is not None and mesh.shape[axis] > 1:
        return mesh, axis
    return None, axis


@contextlib.contextmanager
def use_point_mesh(mesh: Mesh | None, axis: str = "point"):
    if mesh is not None and axis not in mesh.axis_names:
        raise ValueError(f"mesh axes {mesh.axis_names} have no '{axis}' axis")
    token = _POINT_CTX.set((mesh, axis))
    try:
        yield
    finally:
        _POINT_CTX.reset(token)


def shard_pointwise(fn, mesh: Mesh, axis: str, n_sharded: int, n_replicated: int,
                    n_out: int = 1):
    """shard_map wrapper for row-independent point ops: the first ``n_sharded``
    args and every output are split on dim 1 (the point/center axis); the
    remaining ``n_replicated`` args (reference clouds) are replicated.
    ``n_out > 1`` for ops returning a tuple (e.g. three_nn's (dist, idx))."""
    in_specs = tuple([P(None, axis)] * n_sharded + [P()] * n_replicated)
    out_specs = P(None, axis) if n_out == 1 else tuple([P(None, axis)] * n_out)
    return _shard_map(fn, mesh, in_specs, out_specs)


def shard_batched(fn, mesh: Mesh | None, axis: str, n_batched: int,
                  n_replicated: int = 0):
    """Wrap ``fn(*batched, *replicated) -> out`` in shard_map over ``axis``.

    The first ``n_batched`` args and the output are sharded on dim 0 (the batch
    axis); the remaining ``n_replicated`` args (weights) are replicated. ``fn``
    must derive every static quantity (grid, tile sizes) from its *local*
    argument shapes — under shard_map it sees the per-device batch shard.
    Identity when ``mesh`` is None.
    """
    if mesh is None:
        return fn
    in_specs = tuple([P(axis)] * n_batched + [P()] * n_replicated)

    def wrapped(*args):
        b = args[0].shape[0]
        if b % mesh.size:
            raise ValueError(
                f"fused-kernel batch {b} is not divisible by the {mesh.size}-device "
                f"mesh; use a divisible batch or disable the fused path "
                f"(ops.pallas_sa.DISABLE_FUSED)"
            )
        return _shard_map(fn, mesh, in_specs, P(axis))(*args)

    return wrapped
