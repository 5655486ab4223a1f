"""Native C++ host kernels, loaded via ctypes.

Builds ``libptt_native.so`` from ``ptt_native.cpp`` with g++ on first import if it
is missing or stale (source newer than binary), falling back cleanly to None when
no compiler is available — callers must check ``native.available()``.

Provides CPU-exact oracles for the pointnet2 kernel semantics (fps, fps_with_dist,
ball_query with first-hit padding) plus fast host preprocessing (canonical crop,
box decode) for the tracking loop and data loader.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "ptt_native.cpp"
_LIB = _HERE / "libptt_native.so"

_lib = None
_load_error = None


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.fps.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.fps_with_dist.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.ball_query.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, i32p
        ]
        lib.crop_canonical.argtypes = [
            f32p, ctypes.c_int, f32p, f32p, ctypes.c_float, ctypes.c_float, f32p, i32p
        ]
        lib.crop_canonical.restype = ctypes.c_int
        lib.compact_masked.argtypes = [f32p, i32p, ctypes.c_int, f32p]
        lib.decode_box_offset.argtypes = [f32p, f32p, ctypes.c_int, f32p]
        lib.box_iou3d_batch.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        _load_error = e
    return _lib


def available() -> bool:
    return _load() is not None


def _f32(a):
    a = np.ascontiguousarray(a, np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32(a):
    a = np.ascontiguousarray(a, np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """(N, 3) or (B, N, 3) -> (npoint,) / (B, npoint) int32, pointnet2-exact."""
    lib = _load()
    if xyz.ndim == 3:
        return np.stack([fps(x, npoint) for x in xyz])
    xyz, xp = _f32(xyz)
    out, op = _i32(np.empty(npoint, np.int32))
    lib.fps(xp, xyz.shape[0], npoint, op)
    return out


def fps_with_dist(d2: np.ndarray, npoint: int) -> np.ndarray:
    lib = _load()
    if d2.ndim == 3:
        return np.stack([fps_with_dist(x, npoint) for x in d2])
    d2, dp = _f32(d2)
    out, op = _i32(np.empty(npoint, np.int32))
    lib.fps_with_dist(dp, d2.shape[0], npoint, op)
    return out


def ball_query(xyz: np.ndarray, centers: np.ndarray, radius: float, nsample: int) -> np.ndarray:
    """(N, 3) x (M, 3) -> (M, nsample) int32 with first-hit duplicate padding."""
    lib = _load()
    if xyz.ndim == 3:
        return np.stack([ball_query(x, c, radius, nsample) for x, c in zip(xyz, centers)])
    xyz, xp = _f32(xyz)
    centers, cp = _f32(centers)
    out, op = _i32(np.empty((centers.shape[0], nsample), np.int32))
    lib.ball_query(xp, xyz.shape[0], cp, centers.shape[0], radius, nsample, op)
    return out


def crop_canonical(pts: np.ndarray, box_vec, wlh, offset: float, scale: float):
    """Returns (canonical_pts (K, 3) compacted, mask (N,) bool)."""
    lib = _load()
    pts, pp = _f32(pts)
    box, bp = _f32(np.asarray(box_vec))
    wlh, wp = _f32(np.asarray(wlh))
    out_pts, opp = _f32(np.empty_like(pts))
    mask, mp = _i32(np.empty(pts.shape[0], np.int32))
    kept = lib.crop_canonical(pp, pts.shape[0], bp, wp, offset, scale, opp, mp)
    compact, cp2 = _f32(np.empty((kept, 3), np.float32))
    lib.compact_masked(opp, mp, pts.shape[0], cp2)
    return compact, mask.astype(bool)


def box_iou3d_batch(boxes_a: np.ndarray, boxes_b: np.ndarray, z_axis: bool = False):
    """Batched reference-metric 3D IoU + center distance.

    boxes (F, 7) = [cx, cy, cz, w, l, h, yaw] in lidar coords. Returns
    (iou (F,), dist (F,)). Reproduces eval_tracking_metrics.estimateOverlap /
    estimateAccuracy including the identical-box shortcut and (by default) the
    vertical-extent quirk; pass z_axis=True for the z-correct variant.
    """
    lib = _load()
    boxes_a, ap = _f32(boxes_a)
    boxes_b, bp = _f32(boxes_b)
    n = boxes_a.shape[0]
    iou, ip = _f32(np.empty(n, np.float32))
    dist, dp = _f32(np.empty(n, np.float32))
    lib.box_iou3d_batch(ap, bp, n, int(z_axis), ip, dp)
    return iou, dist


def decode_box_offset(box_vec, offset4, use_z: bool) -> np.ndarray:
    lib = _load()
    box, bp = _f32(np.asarray(box_vec))
    off, fp = _f32(np.asarray(offset4))
    out, op = _f32(np.empty(4, np.float32))
    lib.decode_box_offset(bp, fp, int(use_z), op)
    return out
