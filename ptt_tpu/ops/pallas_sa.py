"""Pallas TPU kernel: fused set-abstraction inner loop for inference.

Fuses ball-query + neighborhood grouping + the (BN-folded) shared MLP + the
neighborhood max-pool into ONE kernel, so the grouped (B, npoint, nsample, C+3)
tensor never exists in HBM.

Why: XLA cannot fuse a gather into a matmul operand, so the jnp SA path
(ops.query_and_group -> SharedMLP -> max) materializes the grouped tensor — and
TPU gather materialization is pathological (measured on v5e: 30 ms..1.7 s for the
PTT shapes standalone; 3-22 ms per SA stage inside the jit where it fuses into
the first matmul's operand copy).

Design (two measured iterations — docs/PERFORMANCE.md):

  * The first MLP layer is linear, so it COMMUTES with the gather:
    relu([rel_xyz | feats] @ W1 + b1) = relu(gather(Z) + O) with
    Z = [xyz | feats] @ W1' over the N source points (dense, pre-gather; W1's
    xyz rows pre-divided by radius when normalize_xyz) and per-center offset
    O = b1 - center @ W1'_xyz. Gathering the (N, H1) activations instead of raw
    (N, C+3) points keeps the one-hot matmul's output lanes full (H1 = 64..128
    vs D = 3 at stage 1, where a raw gather wastes 125/128 of the MXU).
  * The neighborhood "gather" is a one-hot matmul on the MXU, NC-chunked in
    VMEM. The MXU's default f32 path is a single bf16 pass, which would round
    the gathered values to 8 significand bits — instead split Z = hi + lo
    (hi = bf16(Z), lo = Z - hi) and take two DEFAULT passes. hi is exactly a
    bf16 value; lo still carries up to 16 significand bits, so the second pass
    rounds it once more: the gather is ~2^-17-relative accurate (NOT f32-exact),
    which is far below the single-bf16-pass (~2^-8) noise the DEFAULT-precision
    MLP tail adds anyway — at 1/3 the cost of a 6-pass HIGHEST matmul. (A third
    lo2 pass would make it exact; measured unnecessary at the tail's precision.)
  * Ball-query semantics are the CUDA kernel's (SURVEY.md 2.2): the first
    `nsample` in-radius points in ascending index order (slot = in-ball ordinal
    via a lane-axis prefix sum), rows past the count duplicate the first hit,
    empty balls pad with point 0 — matching ops.ball_query bit-for-bit.
  * Remaining MLP layers run on (TM*ns, H) tiles at DEFAULT matmul precision —
    the same single-bf16-pass the jnp path's nn.Dense uses on TPU.

  grid (B, M/TM); per program: distances (MXU, HIGHEST — borderline in-ball
  membership must match ops.square_distance) -> slots (VPU) -> hi/lo one-hot
  gather (MXU) -> +O, relu, MLP tail (MXU) -> max over nsample (static slices;
  rows are slot-major r = s*TM + t so everything stays rank-2 for Mosaic).

Used by nn.sa_module for train=False on TPU; the jnp path remains the training
path (BN needs global batch statistics) and the CPU/test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mesh_ctx


def _pick_tm(M: int, width: int) -> int:
    """Center-tile size: VMEM peaks scale with TM*ns*max(H_i). Measured: TM=128
    at widths <= 128 and TM=64 above beats both the all-64 and all-128 variants
    (docs/PERFORMANCE.md)."""
    tm = 64 if width > 128 else 128
    while M % tm:
        tm //= 2
    return max(tm, 1)


def _cumsum_lanes(x):
    """Inclusive prefix sum along the lane (last) axis — Mosaic has no cumsum
    lowering, so do the log-doubling scan with masked rolls (log2(N) VPU rounds)."""
    tm, n = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return x


def _sa_kernel(TM, N, H1, ns, NC, radius, n_tail, *refs):
    x3_ref, ctr_ref, z_ref, off_ref = refs[0], refs[1], refs[2], refs[3]
    out_ref = refs[-1]
    wb = refs[4:-1]  # w, b per tail layer

    x3 = x3_ref[0]  # (N, 3)
    ctr = ctr_ref[0]  # (TM, 3)
    z = z_ref[0]  # (N, H1) first-layer activations, pre-gather
    off = off_ref[0]  # (TM, H1) per-center first-layer offset

    # squared distances centers x points (same arithmetic as ops.square_distance;
    # HIGHEST so borderline in-ball membership matches the jnp oracle)
    c2 = jnp.sum(ctr * ctr, axis=1, keepdims=True)  # (TM, 1)
    p2 = jnp.sum(x3 * x3, axis=1, keepdims=True)  # (N, 1)
    cross = jnp.dot(ctr, x3.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (TM, N)
    d2 = jnp.maximum(c2 + p2.T - 2.0 * cross, 0.0)

    # first-`ns`-in-radius slot assignment
    in_ball = d2 < radius * radius  # (TM, N)
    cnt = _cumsum_lanes(in_ball.astype(jnp.int32))  # (TM, N)
    slot = jnp.where(in_ball & (cnt <= ns), cnt - 1, -1)  # (TM, N)
    used = jnp.minimum(cnt[:, N - 1 :], ns)  # (TM, 1)

    # row r = s*TM + t (slot-major)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM * ns, 1), 0)
    s_of_row = rows // TM  # (TM*ns, 1)

    # one-hot gather of Z, hi/lo split for exactness at 2 bf16 passes
    z_hi = z.astype(jnp.bfloat16).astype(jnp.float32)
    z_lo = z - z_hi
    G = jnp.zeros((TM * ns, H1), jnp.float32)
    for c0 in range(0, N, NC):
        nc = min(NC, N - c0)
        slot_c = slot[:, c0 : c0 + nc]  # (TM, nc)
        slot_rep = jnp.concatenate([slot_c] * ns, axis=0)  # (TM*ns, nc)
        oh = (slot_rep == s_of_row).astype(jnp.float32)
        G = G + jnp.dot(oh, z_hi[c0 : c0 + nc, :], preferred_element_type=jnp.float32)
        G = G + jnp.dot(oh, z_lo[c0 : c0 + nc, :], preferred_element_type=jnp.float32)

    # duplicate-pad: rows past the in-ball count copy slot 0's point; an empty
    # ball pads with point 0 (ops.ball_query / CUDA zero-init semantics)
    first_hit = G[0:TM, :]  # slot-0 rows, per center
    fill = jnp.where(used > 0, first_hit, z[0:1, :])  # (TM, H1)
    valid = s_of_row < jnp.concatenate([used] * ns, axis=0)  # (TM*ns, 1)
    G = jnp.where(valid, G, jnp.concatenate([fill] * ns, axis=0))

    # first layer completes with the per-center offset; tail layers are plain
    # DEFAULT-precision matmuls (same single-bf16-pass as nn.Dense on TPU)
    h = jnp.maximum(G + jnp.concatenate([off] * ns, axis=0), 0.0)
    for li in range(n_tail):
        w = wb[2 * li][:]
        b = wb[2 * li + 1][:]  # (1, Cout)
        h = jnp.maximum(jnp.dot(h, w, preferred_element_type=jnp.float32) + b, 0.0)

    # max over the nsample axis (slot-major rows -> static slices)
    acc = h[0:TM, :]
    for s in range(1, ns):
        acc = jnp.maximum(acc, h[s * TM : (s + 1) * TM, :])
    out_ref[0] = acc


def fused_sa_inference(
    xyz,
    new_xyz,
    features,
    radius: float,
    nsample: int,
    weights,
    biases,
    normalize_xyz: bool = True,
    use_xyz: bool = True,
    interpret: bool = False,
):
    """Fused eval-mode SA stage.

    Args:
      xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None.
      weights/biases: per-MLP-layer folded parameters — W'_i = W_i * s_i and
        b'_i = beta_i - mean_i * s_i with s_i = gamma_i / sqrt(var_i + eps)
        (plain W/bias when the stack has no BN). weights[0] has C+3 rows when
        use_xyz (relative-xyz channels first, like ops.query_and_group).
    Returns:
      (B, M, C_out) == max over neighborhood of MLP([rel_xyz | feats]).

    Under an installed >1-device mesh (ops.mesh_ctx) the kernel runs inside a
    shard_map over the batch axis — every device executes the identical grid
    program on its batch shard. The (mesh, axis) pair is part of the jit key so
    installing a mesh retraces.
    """
    mesh, axis = mesh_ctx.get_mesh()
    return _fused_sa_jit(
        xyz, new_xyz, features, radius, nsample, weights, biases,
        normalize_xyz, use_xyz, interpret, mesh, axis,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "nsample", "normalize_xyz", "use_xyz", "interpret", "mesh", "axis",
    ),
)
def _fused_sa_jit(
    xyz,
    new_xyz,
    features,
    radius: float,
    nsample: int,
    weights,
    biases,
    normalize_xyz: bool,
    use_xyz: bool,
    interpret: bool,
    mesh,
    axis: str,
):
    xyz = jax.lax.stop_gradient(xyz.astype(jnp.float32))
    new_xyz = jax.lax.stop_gradient(new_xyz.astype(jnp.float32))
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]

    # commute the (linear) first layer past the gather: Z over source points,
    # per-center offset O; see module docstring
    w1 = weights[0].astype(jnp.float32)
    b1 = biases[0].reshape(1, -1).astype(jnp.float32)
    if use_xyz:
        w1x = w1[:3] / (radius if normalize_xyz else 1.0)  # (3, H1)
        w1f = w1[3:]
        # HIGHEST on the xyz terms: gather(Z) + O cancels world-coordinate-scale
        # values down to the radius-scale relative offset, so bf16-pass rounding
        # here amplifies ~100x (see pallas_group._fold_inputs); K=3, cost-free
        hi = jax.lax.Precision.HIGHEST
        z = jnp.einsum("bnc,ch->bnh", xyz, w1x, precision=hi)
        if features is not None:
            z = z + jnp.einsum(
                "bnc,ch->bnh", jax.lax.stop_gradient(features.astype(jnp.float32)), w1f
            )
        off = b1[None] - jnp.einsum("bmc,ch->bmh", new_xyz, w1x, precision=hi)  # (B, M, H1)
    else:
        z = jnp.einsum(
            "bnc,ch->bnh", jax.lax.stop_gradient(features.astype(jnp.float32)), w1
        )
        off = jnp.broadcast_to(b1[None], (B, M, b1.shape[-1]))

    H1 = z.shape[-1]
    c_out = weights[-1].shape[-1]
    width = max(H1, *(w.shape[-1] for w in weights))
    wb_args = []
    for w, b in zip(weights[1:], biases[1:]):
        wb_args += [w.astype(jnp.float32), b.reshape(1, -1).astype(jnp.float32)]
    n_tail = len(weights) - 1

    def _call(xyz_, new_xyz_, z_, off_, *wb):
        # static quantities from LOCAL shapes: under shard_map this traces with
        # the per-device batch shard (B/mesh.size)
        b_loc, n_loc = xyz_.shape[0], xyz_.shape[1]
        m_loc = new_xyz_.shape[1]
        TM = _pick_tm(m_loc, width)
        NC = 256 if n_loc > 256 else n_loc
        kernel = functools.partial(
            _sa_kernel, TM, n_loc, H1, int(nsample), NC, float(radius), n_tail
        )
        wb_specs = []
        for wi in range(n_tail):
            w, b = wb[2 * wi], wb[2 * wi + 1]
            wb_specs += [
                pl.BlockSpec(w.shape, lambda b_, m_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(b.shape, lambda b_, m_: (0, 0), memory_space=pltpu.VMEM),
            ]
        return pl.pallas_call(
            kernel,
            grid=(b_loc, m_loc // TM),
            in_specs=[
                pl.BlockSpec((1, n_loc, 3), lambda b_, m_: (b_, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TM, 3), lambda b_, m_: (b_, m_, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_loc, H1), lambda b_, m_: (b_, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TM, H1), lambda b_, m_: (b_, m_, 0), memory_space=pltpu.VMEM),
                *wb_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, TM, c_out), lambda b_, m_: (b_, m_, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b_loc, m_loc, c_out), jnp.float32),
            interpret=interpret,
        )(xyz_, new_xyz_, z_, off_, *wb)

    call = mesh_ctx.shard_batched(_call, mesh, axis, 4, len(wb_args))
    return call(xyz, new_xyz, z, off, *wb_args)


def fold_bn(kernel_w, bn_scale, bn_bias, bn_mean, bn_var, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding (bias-free) Dense:
    y = BN(xW) = x (W*s) + (beta - mean*s), s = gamma / sqrt(var + eps)."""
    s = bn_scale * jax.lax.rsqrt(bn_var + eps)
    return kernel_w * s[None, :], bn_bias - bn_mean * s


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - uninitialized backend
        return False


# Tests flip this to exercise the fused module path off-TPU via the Pallas
# interpreter (slow; small shapes only). Read at trace time.
FORCE_INTERPRET = False

# Force the jnp composite path even on TPU — used by the fused-vs-jnp metric A/B
# (docs/PARITY.md) and by profiling walks that need the unfused layer structure.
# Read at trace time: flip it before tracing/jitting, not between calls of an
# already-compiled function.
DISABLE_FUSED = False


def fused_enabled() -> bool:
    """Whether nn.sa_module should take the fused (Pallas-kernel) paths.

    Multi-chip: the kernels run inside a shard_map over the batch axis of the
    installed mesh (ops.mesh_ctx — set by make_sharded_train_step / the eval
    device loop / dryrun_multichip), so the fused paths survive scaling. On a
    multi-device backend WITHOUT an installed mesh we fall back to the jnp path:
    a bare pallas_call has no partitioning rule, and whether the surrounding
    program is sharded is unknowable here.
    """
    if DISABLE_FUSED:
        return False
    # point-axis-sharded runs (POINT_SHARDING configs) use the jnp SA path: its
    # ball query routes through the sharded ops, whereas the fused kernel holds
    # the full cloud per program and would run replicated
    if mesh_ctx.get_point_mesh()[0] is not None:
        return False
    if FORCE_INTERPRET:
        return True
    try:
        if not on_tpu():
            return False
        if len(jax.devices()) == 1:
            return True
        return mesh_ctx.get_mesh()[0] is not None
    except Exception:  # pragma: no cover - uninitialized backend
        return False
