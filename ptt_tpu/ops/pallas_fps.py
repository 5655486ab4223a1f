"""Pallas TPU kernel for farthest point sampling.

FPS is inherently sequential (npoint rounds of masked argmax), so the design goal
is minimizing per-round latency and never paying it more than once:

  - the WHOLE batch advances together inside ONE kernel program: the per-round
    carry is an (B, 1) vector of current centers, every op is row-vectorized over
    the batch (masked-sum gather, distance update, row-max, row tie-break-min) —
    unlike a per-batch-row grid, where TPU cores run grid programs sequentially
    and the round latency multiplies by B;
  - the running min-distance state lives in VMEM scratch across all rounds; no
    per-round HBM traffic or XLA fusion boundaries (the jnp fallback pays a
    dynamic-update-slice round trip per round).

Semantics identical to ops.point_ops.furthest_point_sample (and the pointnet2
CUDA kernel, SURVEY.md §2.2): start at index 0, greedily take the argmax of the
min squared distance, ties to the lowest index.

~3x faster than the jnp fori_loop version on a v5e chip at PTT shapes
(B=8, 1024->512: 0.9 ms vs 2.6 ms), and independent of batch size up to the
VMEM budget. Exposed as ``furthest_point_sample(xyz, npoint)`` with automatic
fallback to the jnp implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mesh_ctx, point_ops


def _fps_kernel(npoint: int, B: int, n: int, xyz_ref, out_ref, min_d2_ref):
    # xyz_ref: (3, B, N) f32; out_ref: (B, npoint) i32; min_d2_ref: (B, N) f32
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, n), dimension=1)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), dimension=1)
    min_d2_ref[:] = jnp.full((B, n), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((B, npoint), jnp.int32)

    def body(i, farthest):
        # farthest: (B, 1) int32 — all batch rows advance together
        out_ref[:] = jnp.where(lane_out == i, farthest, out_ref[:])
        sel = (lane == farthest).astype(jnp.float32)  # (B, N) one-hot per row
        cx = jnp.sum(x * sel, axis=1, keepdims=True)
        cy = jnp.sum(y * sel, axis=1, keepdims=True)
        cz = jnp.sum(z * sel, axis=1, keepdims=True)
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        m = jnp.minimum(min_d2_ref[:], d2)
        min_d2_ref[:] = m
        mx = jnp.max(m, axis=1, keepdims=True)
        # first-occurrence argmax per row
        return jnp.min(jnp.where(m == mx, lane, n), axis=1, keepdims=True).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, jnp.zeros((B, 1), jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("npoint", "interpret", "mesh", "axis")
)
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 interpret: bool = False, mesh=None, axis="data"):
    """xyz (B, N, 3) -> (B, npoint) int32 via the Pallas kernel.

    ``mesh``/``axis``: optional installed mesh (ops.mesh_ctx) — the kernel then
    runs in a shard_map over the batch axis; part of the jit key so installing
    a mesh retraces."""
    # index-valued op: no gradient flows through sampling (the CUDA kernel's
    # wrapper marks it non-differentiable too); stop_gradient keeps AD from
    # attempting a JVP rule for the pallas_call
    xyz = jax.lax.stop_gradient(xyz)

    def _call(xyz_):
        B, N, _ = xyz_.shape  # local batch shard under shard_map
        xyz_t = jnp.transpose(xyz_.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
        kernel = functools.partial(_fps_kernel, npoint, B, N)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
            interpret=interpret,
        )(xyz_t)

    return mesh_ctx.shard_batched(_call, mesh, axis, 1)(xyz)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU, jnp reference elsewhere. Under an
    installed >1-device mesh the kernel shard_maps over the batch axis (the
    batch must divide the mesh; the jnp path partitions automatically when it
    doesn't, so multi-chip never silently breaks)."""
    mesh, axis = mesh_ctx.get_mesh()
    if on_tpu():
        if mesh is not None and xyz.shape[0] % mesh.size:
            return point_ops.furthest_point_sample(xyz, npoint)
        return furthest_point_sample_pallas(xyz, npoint, mesh=mesh, axis=axis)
    return point_ops.furthest_point_sample(xyz, npoint)


def furthest_point_sample_pair(xyz_a, npoint_a: int, xyz_b, npoint_b: int):
    """FPS over two point sets in ONE kernel invocation (the Siamese search +
    template branches). FPS cost is sequential rounds x per-round latency, and
    rounds vectorize over batch rows — so the smaller set's rounds ride along with
    the larger set's for free instead of paying a second sequential pass.

    The smaller set is padded to the larger N with copies of its point 0: pads
    have min-distance 0 from round 0 (index 0 is always selected first) and are
    never the argmax while any real point remains, and greedy FPS is prefix-stable
    so truncating the padded run to ``npoint_b`` equals the unpadded run.

    Returns (idx_a (B, npoint_a), idx_b (B, npoint_b)) — bit-identical to two
    separate calls.
    """
    assert xyz_a.shape[1] >= xyz_b.shape[1] and npoint_a >= npoint_b, (
        "pass the larger branch first"
    )
    B, Na, _ = xyz_a.shape
    Nb = xyz_b.shape[1]
    if Nb < Na:
        pad = jnp.broadcast_to(xyz_b[:, :1], (B, Na - Nb, 3))
        xyz_b = jnp.concatenate([xyz_b, pad], axis=1)
    stacked = jnp.concatenate([xyz_a, xyz_b], axis=0)  # (2B, Na, 3)
    idx = furthest_point_sample(stacked, npoint_a)
    return idx[:B], idx[B:, :npoint_b]
