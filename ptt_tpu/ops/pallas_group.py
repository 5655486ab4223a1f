"""Pallas TPU kernels: fused ball-query + group + first-linear-layer for TRAINING.

The eval path fuses the entire SA stage into one kernel (pallas_sa.py), but
training cannot: BatchNorm needs global batch statistics of every layer's
pre-activation, so the (B, npoint, nsample, H) tensors must exist between
layers. What training CAN avoid is the neighborhood gather itself — measured at
32% of the whole train step (118.4 -> 80.1 ms/it with the gathers ablated,
docs/PERFORMANCE.md): XLA lowers the grouped gather (forward) and its
scatter-add (backward) pathologically on TPU.

This module provides ``grouped_first_linear`` with a custom VJP:

  forward:   D = [rel_xyz/r | feats_gathered] @ W1        (B, ns, M, H)
    == the jnp composite ops.query_and_group -> Dense (no bias), exploiting the
    same linearity trick as the eval kernel: D_{c,s} = Z_{j(c,s)} + O_c with
    Z = [xyz | feats] @ W' (dense, XLA), O_c = b-like per-center offset. The
    kernel does ball-query (prefix-sum slots, no sort) + hi/lo one-hot gather.
    Output is slot-major (B, ns, M, H) — BatchNorm/Dense/ReLU are axis-agnostic
    and the neighborhood max simply pools axis 1, so no transpose is needed.

  backward:  dZ = scatter-add of dD over the selected columns, as a hi/lo
    one-hot TRANSPOSE matmul accumulated across center tiles (never an XLA
    scatter); pad rows route their gradient to the duplicated source point
    (first hit, or point 0 for empty balls) exactly like ops.group_points'
    scatter-add vjp. dW1 / dxyz / dnew_xyz / dfeats then follow by dense XLA
    matmuls outside the kernel (see _grouped_first_linear_bwd).

Numerics: one-hot matmuls use the hi/lo split (two DEFAULT passes, ~2^-17
relative — see pallas_sa docstring); the surrounding dense matmuls are the same
single-bf16-pass DEFAULT precision the jnp path's Dense uses. Gradients agree
with the jnp composite to ~1e-5 relative in the f32 interpreter tests.

Used by nn.sa_module when train=True on TPU (same fused_enabled() gate as the
eval kernel); CPU/CI keeps the jnp composite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mesh_ctx
from .pallas_sa import _cumsum_lanes, _pick_tm


def _slots(ctr, x3, radius, ns):
    """Shared ball-query slot assignment (TM, N): slot index per (center, point)
    for the first-`ns`-in-radius selection, -1 outside; plus per-center counts."""
    c2 = jnp.sum(ctr * ctr, axis=1, keepdims=True)
    p2 = jnp.sum(x3 * x3, axis=1, keepdims=True)
    cross = jnp.dot(ctr, x3.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(c2 + p2.T - 2.0 * cross, 0.0)
    in_ball = d2 < radius * radius
    cnt = _cumsum_lanes(in_ball.astype(jnp.int32))
    slot = jnp.where(in_ball & (cnt <= ns), cnt - 1, -1)  # (TM, N)
    used = jnp.minimum(cnt[:, -1:], ns)  # (TM, 1)
    return slot, used


def _fwd_kernel(TM, N, H, ns, NC, radius, *refs):
    x3_ref, ctr_ref, z_ref, off_ref, out_ref = refs
    x3 = x3_ref[0]
    ctr = ctr_ref[0]
    z = z_ref[0]
    off = off_ref[0]

    slot, used = _slots(ctr, x3, radius, ns)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TM * ns, 1), 0)
    s_of_row = rows // TM  # slot-major rows r = s*TM + t

    z_hi = z.astype(jnp.bfloat16).astype(jnp.float32)
    z_lo = z - z_hi
    G = jnp.zeros((TM * ns, H), jnp.float32)
    for c0 in range(0, N, NC):
        nc = min(NC, N - c0)
        slot_c = slot[:, c0 : c0 + nc]
        slot_rep = jnp.concatenate([slot_c] * ns, axis=0)
        oh = (slot_rep == s_of_row).astype(jnp.float32)
        G = G + jnp.dot(oh, z_hi[c0 : c0 + nc, :], preferred_element_type=jnp.float32)
        G = G + jnp.dot(oh, z_lo[c0 : c0 + nc, :], preferred_element_type=jnp.float32)

    first_hit = G[0:TM, :]
    fill = jnp.where(used > 0, first_hit, z[0:1, :])
    valid = s_of_row < jnp.concatenate([used] * ns, axis=0)
    G = jnp.where(valid, G, jnp.concatenate([fill] * ns, axis=0))

    D = G + jnp.concatenate([off] * ns, axis=0)  # (TM*ns, H) slot-major
    for s in range(ns):  # static rank-2 stores (Mosaic-friendly)
        out_ref[0, s] = D[s * TM : (s + 1) * TM, :]


def _bwd_kernel(TM, N, H, ns, NC, radius, *refs):
    x3_ref, ctr_ref, dd_ref, dz_ref = refs
    x3 = x3_ref[0]
    ctr = ctr_ref[0]
    # slot-major rows r = s*TM + t, assembled from static rank-2 loads
    dd = jnp.concatenate([dd_ref[0, s] for s in range(ns)], axis=0)  # (TM*ns, H)

    m_idx = pl.program_id(1)

    @pl.when(m_idx == 0)
    def _init():
        dz_ref[0] = jnp.zeros_like(dz_ref[0])

    slot, used = _slots(ctr, x3, radius, ns)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TM * ns, 1), 0)
    s_of_row = rows // TM
    used_rep = jnp.concatenate([used] * ns, axis=0)  # (TM*ns, 1)
    valid = s_of_row < used_rep

    dd_hi = dd.astype(jnp.bfloat16).astype(jnp.float32)
    dd_lo = dd - dd_hi
    # pad rows (valid == False) duplicated the fill value; their gradient goes to
    # the first-hit point (slot 0) when the ball is non-empty, else to point 0
    P = jnp.sum(jnp.where(valid, 0.0, dd).reshape(ns, TM, H), axis=0)  # (TM, H)
    P_first = jnp.where(used > 0, P, 0.0)
    P_zero = jnp.sum(jnp.where(used > 0, 0.0, P), axis=0, keepdims=True)  # (1, H)
    P_hi = P_first.astype(jnp.bfloat16).astype(jnp.float32)
    P_lo = P_first - P_hi

    dd_val_hi = jnp.where(valid, dd_hi, 0.0)
    dd_val_lo = jnp.where(valid, dd_lo, 0.0)

    for c0 in range(0, N, NC):
        nc = min(NC, N - c0)
        slot_c = slot[:, c0 : c0 + nc]
        slot_rep = jnp.concatenate([slot_c] * ns, axis=0)  # (TM*ns, nc)
        oh = (slot_rep == s_of_row).astype(jnp.float32)
        # valid-row contributions: ohT @ dD
        acc = jnp.dot(oh.T, dd_val_hi, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(oh.T, dd_val_lo, preferred_element_type=jnp.float32)
        # pad-row mass routed to each center's first hit (slot 0 column)
        oh0 = (slot_c == 0).astype(jnp.float32)  # (TM, nc)
        acc = acc + jnp.dot(oh0.T, P_hi, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(oh0.T, P_lo, preferred_element_type=jnp.float32)
        dz_ref[0, c0 : c0 + nc, :] += acc
    # empty-ball pad mass goes to point 0 (f32 add, no matmul needed)
    dz_ref[0, 0:1, :] += P_zero


HI = jax.lax.Precision.HIGHEST


def _fold_inputs(xyz, new_xyz, features, w1, radius, normalize_xyz, use_xyz):
    """Dense pre-kernel algebra shared by fwd and bwd: Z over source points and
    per-center offsets O (see module docstring).

    The xyz terms MUST run at HIGHEST precision: D = Z_j + O_c cancels two
    world-coordinate-scale terms down to the (radius-scale) relative offset, so
    a single-bf16-pass rounding of Z/O turns into ~10% relative error on D
    (measured as a 0.15 step-0 loss shift). K=3 contractions — HIGHEST is free.
    The feature term has no cancellation and stays at DEFAULT (same as the jnp
    path's Dense)."""
    r = radius if normalize_xyz else 1.0
    if use_xyz:
        w1x = w1[:3] / r
        z = jnp.einsum("bnc,ch->bnh", xyz, w1x, precision=HI)
        if features is not None:
            z = z + jnp.einsum("bnc,ch->bnh", features, w1[3:])
        off = -jnp.einsum("bmc,ch->bmh", new_xyz, w1x, precision=HI)
    else:
        z = jnp.einsum("bnc,ch->bnh", features, w1)
        off = jnp.zeros((xyz.shape[0], new_xyz.shape[1], w1.shape[1]), jnp.float32)
    return z, off


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def grouped_first_linear(
    xyz, new_xyz, features, w1,
    radius: float, nsample: int,
    normalize_xyz: bool = True, use_xyz: bool = True, interpret: bool = False,
):
    """Fused ball-query + group + (bias-free) first linear layer.

    Args:
      xyz: (B, N, 3) source points; new_xyz: (B, M, 3) centers;
      features: (B, N, C) or None; w1: (C+3, H) when use_xyz else (C, H) —
        the SharedMLP's Dense_0 kernel.
    Returns:
      (B, nsample, M, H) pre-BN activations, slot-major (pool over axis 1).
    """
    out, _ = _grouped_first_linear_fwd(
        xyz, new_xyz, features, w1, radius, nsample, normalize_xyz, use_xyz, interpret
    )
    return out


def _run_fwd(z, off, xyz, new_xyz, radius, nsample, interpret):
    H = z.shape[-1]

    def _call(xyz_, new_xyz_, z_, off_):
        # static quantities from LOCAL shapes (per-device batch shard under mesh)
        b_loc, n_loc = xyz_.shape[0], xyz_.shape[1]
        m_loc = new_xyz_.shape[1]
        TM = _pick_tm(m_loc, H)
        NC = 256 if n_loc > 256 else n_loc
        kernel = functools.partial(
            _fwd_kernel, TM, n_loc, H, int(nsample), NC, float(radius)
        )
        return pl.pallas_call(
            kernel,
            grid=(b_loc, m_loc // TM),
            in_specs=[
                pl.BlockSpec((1, n_loc, 3), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TM, 3), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_loc, H), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TM, H), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, nsample, TM, H), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b_loc, nsample, m_loc, H), jnp.float32),
            interpret=interpret,
        )(xyz_, new_xyz_, z_, off_)

    mesh, axis = mesh_ctx.get_mesh()
    return mesh_ctx.shard_batched(_call, mesh, axis, 4)(xyz, new_xyz, z, off)


def _grouped_first_linear_fwd(
    xyz, new_xyz, features, w1, radius, nsample, normalize_xyz, use_xyz, interpret
):
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    if features is not None:
        features = features.astype(jnp.float32)
    w1 = w1.astype(jnp.float32)
    z, off = _fold_inputs(xyz, new_xyz, features, w1, radius, normalize_xyz, use_xyz)
    out = _run_fwd(z, off, xyz, new_xyz, radius, nsample, interpret)
    return out, (xyz, new_xyz, features, w1)


def _grouped_first_linear_bwd(
    radius, nsample, normalize_xyz, use_xyz, interpret, res, dD
):
    xyz, new_xyz, features, w1 = res
    H = w1.shape[1]
    dD = dD.astype(jnp.float32)

    def _call(xyz_, new_xyz_, dD_):
        b_loc, n_loc = xyz_.shape[0], xyz_.shape[1]
        m_loc = new_xyz_.shape[1]
        # smaller center tiles than forward: the backward holds ~5 slot-major
        # (TM*ns, H) temporaries (dD + hi/lo splits) plus the (N, H) accumulator
        # in VMEM at once; TM=128 OOMs the 16M scoped-vmem limit at stage-1 shapes
        TM = 32 if H > 128 else 64
        while m_loc % TM:
            TM //= 2
        TM = max(TM, 1)
        NC = 256 if n_loc > 256 else n_loc
        kernel = functools.partial(
            _bwd_kernel, TM, n_loc, H, int(nsample), NC, float(radius)
        )
        return pl.pallas_call(
            kernel,
            grid=(b_loc, m_loc // TM),
            in_specs=[
                pl.BlockSpec((1, n_loc, 3), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TM, 3), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, nsample, TM, H), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((1, n_loc, H), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_loc, n_loc, H), jnp.float32),
            interpret=interpret,
        )(xyz_, new_xyz_, dD_)

    mesh, axis = mesh_ctx.get_mesh()
    dZ = mesh_ctx.shard_batched(_call, mesh, axis, 3)(xyz, new_xyz, dD)

    dO = jnp.sum(dD, axis=1)  # (B, M, H): every slot row carries off once
    r = radius if normalize_xyz else 1.0

    if use_xyz:
        w1x = w1[:3] / r
        # xyz-side einsums at HIGHEST for the same cancellation reason as
        # _fold_inputs (dw1x subtracts two world-coordinate-scale sums)
        dxyz = jnp.einsum("bnh,ch->bnc", dZ, w1x, precision=HI)
        dfeats = (
            jnp.einsum("bnh,ch->bnc", dZ, w1[3:]) if features is not None else None
        )
        # through O = -(centers) @ w1x
        dnew_xyz = -jnp.einsum("bmh,ch->bmc", dO, w1x, precision=HI)
        # dW1: xyz rows get the 1/r fold; feature rows don't
        dw1x = (
            jnp.einsum("bnc,bnh->ch", xyz, dZ, precision=HI)
            - jnp.einsum("bmc,bmh->ch", new_xyz, dO, precision=HI)
        ) / r
        if features is not None:
            dw1f = jnp.einsum("bnc,bnh->ch", features, dZ)
            dw1 = jnp.concatenate([dw1x, dw1f], axis=0)
        else:
            dw1 = dw1x
    else:
        dxyz = jnp.zeros_like(xyz)
        dnew_xyz = jnp.zeros_like(new_xyz)
        dfeats = jnp.einsum("bnh,ch->bnc", dZ, w1)
        dw1 = jnp.einsum("bnc,bnh->ch", features, dZ)

    return dxyz, dnew_xyz, dfeats, dw1


grouped_first_linear.defvjp(_grouped_first_linear_fwd, _grouped_first_linear_bwd)
