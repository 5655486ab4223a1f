"""Device-resident tracking: the entire autoregressive per-tracklet loop compiled
into ONE XLA program (`lax.scan` over frames), instead of the reference's per-frame
host<->device ping-pong (eval_tracking_utils.py:140-151: numpy crop -> upload ->
model -> download -> numpy decode, every frame).

Why: each host<->device interaction costs a fixed dispatch/transfer latency; the
reference pays 3+ of them per frame at batch=1. Here a tracklet's padded point
clouds are uploaded once, the scan carries the predicted box as device state, and
one (T, 4) box array comes back — so per-frame cost approaches pure compute. The
tracker is natively batched over tracklets (a true (B, ...) batch inside the scan)
for throughput.

Semantics mirror the host evaluator (evaluator.py / reference crop_center_pc,
get_model, regularize_pc, get_box_by_offset) with two documented deviations, both
confined to RNG details:
  - point resampling uses JAX PRNG streams (fixed base key), not numpy's global
    seed-1 reseed (kitti_tracking_utils.py:350) — same uniform-with-replacement
    distribution, different stream;
  - get_box_by_offset's out-of-range offset resampling (a train-time augmentation
    guard) is omitted: network offsets are sub-meter by construction.
All four SHAPE_AGGREGATION modes run here, including 'all' (reference
eval_tracking_utils.py:187-230): the scan carries the predicted-box history and
re-crops every earlier frame from the resident (B, T, N) buffer each step —
exact host-'all' semantics (up to the RNG deviation above) without the host
path's ~1000x slowdown. All three
TEST.REF_BOX modes are supported (previous_result deployment mode plus the
previous_gt / current_gt diagnostics, reference eval_tracking_utils.py:154-161):
the GT modes crop and decode against the ground-truth box array carried alongside
the scan while the template still follows the predicted trajectory, exactly like
the reference's ``results_BBs``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo


def _rot_z(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def crop_canonical(pts, valid, box_vec, wlh, offset, scale):
    """Transform points into the box canonical frame and mask to the scaled box AABB
    (the device analog of crop_center_pc's test path, geometry.py:298).

    pts (N, 3), valid (N,) bool, box_vec (4,) = [cx, cy, cz, yaw], wlh (3,) = [w, l, h].
    Returns (canonical pts (N, 3), in-crop mask (N,)).
    """
    center, yaw = box_vec[:3], box_vec[3]
    canon = (pts - center) @ _rot_z(yaw)
    w, l, h = wlh[0], wlh[1], wlh[2]
    half = jnp.stack([l / 2 * scale + offset, w / 2 * scale + offset, h / 2 * scale + offset])
    mask = jnp.all(jnp.abs(canon) <= half, axis=-1) & valid
    return canon, mask


def precrop_mask(pts, box_vec, wlh, offset, scale):
    """The reference's loose world-frame pre-crop (crop_pc at 2*offset, 4*scale:
    the AABB of the 4*scale-scaled box's corners padded by 2*offset,
    kitti_tracking_utils.py:275-297). The eval search crop is this AABB
    INTERSECTED with the slacked canonical crop — the 0.6*length slack can poke
    outside the AABB for long-low boxes, so the bound is load-bearing."""
    center, yaw = box_vec[:3], box_vec[3]
    c, s = jnp.abs(jnp.cos(yaw)), jnp.abs(jnp.sin(yaw))
    hx = 2.0 * scale * wlh[1]  # box-frame x extent = length
    hy = 2.0 * scale * wlh[0]
    hz = 2.0 * scale * wlh[2]
    half = jnp.stack([c * hx + s * hy, s * hx + c * hy, hz]) + 2.0 * offset
    d = pts - center
    return jnp.all((d < half) & (d > -half), axis=-1)


def masked_resample(pts, mask, n_out: int, key):
    """Uniform-with-replacement resample of the masked rows to exactly ``n_out``
    (device analog of regularize_pc, geometry.py:392: <=2 valid points -> zeros).

    The pick-th valid row is selected via an argsort that moves valid rows first
    (stable, so original order is preserved among them)."""
    order = jnp.argsort(jnp.logical_not(mask), stable=True)  # valid rows first
    count = jnp.sum(mask)
    pick = jax.random.randint(key, (n_out,), 0, jnp.maximum(count, 1))
    out = jnp.take(pts, jnp.take(order, pick), axis=0)
    return jnp.where(count > 2, out, jnp.zeros_like(out)), count


def masked_resample_long(pts, mask, n_out: int, key):
    """Bit-identical to masked_resample (same key -> same picks -> same rows;
    tests/test_device_loop.py), but selects the k-th valid row via a prefix sum +
    searchsorted instead of a stable argsort — O(L) + O(n_out log L) instead of
    an O(L log^2 L) on-device bitonic sort. Asymptotically better, but measured
    ~10-15% slower end-to-end at the bench's short rows (L=1280), so the in-scan
    dispatcher below is length-adaptive."""
    csum = jnp.cumsum(mask.astype(jnp.int32))  # (L,), monotone
    count = csum[-1]
    pick = jax.random.randint(key, (n_out,), 0, jnp.maximum(count, 1))
    idx = jnp.searchsorted(csum, pick + 1, side="left")
    out = jnp.take(pts, idx, axis=0, mode="clip")
    return jnp.where(count > 2, out, jnp.zeros_like(out)), count


def masked_resample_auto(pts, mask, n_out: int, key):
    """Length-adaptive masked resample (both variants pick identical rows):
    the bitonic argsort wins at short rows (bench A/B, docs/PERFORMANCE.md), the
    prefix-sum selector at long ones (real-KITTI max_points=16384 frames and the
    'all'-aggregation T*N union)."""
    fn = masked_resample if pts.shape[0] <= 4096 else masked_resample_long
    return fn(pts, mask, n_out, key)


def decode_box_offset(box_vec, offset4, use_z: bool):
    """Apply the network's canonical-frame offset [dx, dy, dz, dtheta_deg] to the
    reference box (device analog of get_box_by_offset, geometry.py:364)."""
    center, yaw = box_vec[:3], box_vec[3]
    delta = jnp.stack([offset4[0], offset4[1], jnp.where(use_z, offset4[2], 0.0)])
    new_center = center + delta @ _rot_z(yaw).T
    new_yaw = yaw + jnp.deg2rad(offset4[3])
    return jnp.concatenate([new_center, new_yaw[None]])


QUANT_SCALE = 1.0 / 256.0  # int16 fixed-point grid: 3.9 mm, range +-128 m


def make_device_tracker(
    model,
    data_cfg,
    test_cfg,
    batched: bool = True,
    quantized_points: bool = False,
):
    """Build the jitted whole-tracklet tracker.

    Returns ``track(variables, pcs, counts, init_box, wlh, key) -> (boxes, scores)``:
      pcs (T, N, 3) padded frame clouds  (batched: (B, T, N, 3))
      counts (T,) valid points per frame (batched: (B, T))
      init_box (4,) frame-0 GT [cx, cy, cz, yaw]
      wlh (3,) tracklet box size (all predicted boxes share frame-0 wlh, like the
        reference where get_box_by_offset copies the box)
      -> boxes (T, 4) predicted [cx, cy, cz, yaw] per frame (frame 0 = init_box),
         scores (T,) best-proposal logits (frame 0 = +inf).
    """
    search_size = int(data_cfg["SEARCH_INPUT_SIZE"])
    template_size = int(data_cfg["TEMPLATE_INPUT_SIZE"])
    search_offset = float(data_cfg.get("SEARCH_BB_OFFSET", 0.0))
    search_scale = float(data_cfg.get("SEARCH_BB_SCALE", 1.25))
    model_offset = float(data_cfg.get("MODEL_BB_OFFSET", 0.0))
    model_scale = float(data_cfg.get("MODEL_BB_SCALE", 1.25))
    use_z = bool(data_cfg.get("USE_Z_AXIS", False))
    aggregation = str(test_cfg.get("SHAPE_AGGREGATION", "firstandprevious")).upper()
    ref_mode_raw = str(test_cfg.get("REF_BOX", "previous_result")).upper()
    # 'all' is the host evaluator's else-branch (evaluator.py:116-117, reference
    # eval_tracking_utils.py:187-230): template = crops of ALL previous frames
    # around their predicted boxes. The host concat is unbounded, but the full
    # (B, T, N) frame buffer already lives on device — so the scan reproduces it
    # EXACTLY (up to the documented RNG-stream deviation) by carrying the
    # predicted-box history and re-cropping every frame < t each step. O(T^2*N)
    # elementwise work total, trivial next to the model matmuls.
    use_all = not ("FIRST" in aggregation or "PREVIOUS" in aggregation)
    # substring matching ordered like the reference (eval_tracking_utils.py:154-161)
    if "PREVIOUS_RESULT" in ref_mode_raw:
        ref_mode = "PREVIOUS_RESULT"
    elif "PREVIOUS_GT" in ref_mode_raw:
        ref_mode = "PREVIOUS_GT"
    elif "CURRENT_GT" in ref_mode_raw:
        ref_mode = "CURRENT_GT"
    else:
        raise ValueError(
            "TEST.REF_BOX must be previous_result / previous_gt / current_gt"
        )

    # batch-vectorized host-prep primitives (pure jnp; cheap to vmap)
    _crop_b = jax.vmap(crop_canonical, in_axes=(0, 0, 0, 0, None, None))
    # search crop with a per-row offset: the reference evaluator's search crop
    # carries ``offset + gt.wlh[1]*0.6`` slack (crop_center_pc's gt branch,
    # kitti_tracking_utils.py:321, taken by prepare_search) — wlh varies per
    # tracklet, so the offset rides the batch axis — bounded by the loose
    # world-frame pre-crop (see precrop_mask)
    _crop_search_b = jax.vmap(crop_canonical, in_axes=(0, 0, 0, 0, 0, None))
    _precrop_b = jax.vmap(precrop_mask, in_axes=(0, 0, 0, None, None))
    _resample_b = jax.vmap(masked_resample_auto, in_axes=(0, 0, None, 0))
    _decode_b = jax.vmap(decode_box_offset, in_axes=(0, 0, None))
    # (B, T, ...) crop: inner vmap over frames (shared wlh), outer over tracklets
    _crop_bt = jax.vmap(
        jax.vmap(crop_canonical, in_axes=(0, 0, 0, None, None, None)),
        in_axes=(0, 0, 0, 0, None, None),
    )

    def track_batched(variables, pcs, counts, init_boxes, wlhs, keys, gt_boxes=None):
        """Natively batched over tracklets — the model (and its Pallas kernels) see
        a true (B, ...) batch inside the scan, instead of vmap-lifted singletons
        (pallas_call under vmap becomes B sequential grid programs on one core).

        With ``quantized_points`` the (B, T, N, 3) cloud arrives as int16
        fixed-point (QUANT_SCALE grid) — halving the host->device transfer, which
        dominates end-to-end time on PCIe/tunnel-attached hosts — and frames are
        dequantized per scan step (never materializing the f32 buffer in HBM).

        ``gt_boxes`` (B, T, 4) is required for the GT-referenced REF_BOX modes and
        ignored (may be None) for previous_result."""
        B, T, N = pcs.shape[0], pcs.shape[1], pcs.shape[2]
        if ref_mode != "PREVIOUS_RESULT" and gt_boxes is None:
            raise ValueError(f"REF_BOX={ref_mode} needs the gt_boxes (B, T, 4) array")
        search_offsets = search_offset + 0.6 * wlhs[:, 1]  # (B,) reference slack

        def frame(t):
            f = jnp.take(pcs, t, axis=1)
            if quantized_points:
                f = f.astype(jnp.float32) * QUANT_SCALE
            return f
        valid = jnp.arange(N)[None, None, :] < counts[:, :, None]  # (B, T, N)

        # frame-0 template source: crop frame 0 in the init box frame, once
        first_canon, first_mask = _crop_b(
            frame(0), valid[:, 0], init_boxes, wlhs, model_offset, model_scale
        )
        # per-row, per-step keys: (B, T-1, ...) -> scan consumes a (B,) slice per step
        row_keys = jax.vmap(lambda k: jax.random.split(k, T - 1))(keys)

        def step(carry, xs):
            # index into the closed-over (B, T, N, 3) buffer instead of threading
            # slices through scan xs (which would materialize extra copies in HBM)
            if use_all:
                prev_boxes, boxes_hist = carry  # hist (B, T, 4): predicted so far
            else:
                prev_boxes = carry
            t, k = xs
            cur_pts = frame(t)
            cur_valid = jnp.take(valid, t, axis=1)
            prev_pts = frame(t - 1)
            prev_valid = jnp.take(valid, t - 1, axis=1)
            ks = jax.vmap(lambda kk: jax.random.split(kk, 2))(k)  # (B, 2, key)

            # reference box for the search crop AND the offset decode
            # (reference prepare_search :154-161 + post_process :266-270); the
            # template below always follows the predicted trajectory (results_BBs)
            if ref_mode == "PREVIOUS_GT":
                ref_boxes = jnp.take(gt_boxes, t - 1, axis=1)
            elif ref_mode == "CURRENT_GT":
                ref_boxes = jnp.take(gt_boxes, t, axis=1)
            else:
                ref_boxes = prev_boxes

            search_canon, search_mask = _crop_search_b(
                cur_pts, cur_valid, ref_boxes, wlhs, search_offsets, search_scale
            )
            search_mask = search_mask & _precrop_b(
                cur_pts, ref_boxes, wlhs, search_offset, search_scale
            )
            search, _ = _resample_b(search_canon, search_mask, search_size, ks[:, 0])

            if use_all:
                # crops of every frame f < t around its predicted box (host
                # evaluator 'all': get_model(pcs[:t], results)); frames >= t
                # masked out, then one uniform resample over the whole union
                allf = (
                    pcs.astype(jnp.float32) * QUANT_SCALE if quantized_points else pcs
                )
                canon_all, mask_all = _crop_bt(
                    allf, valid, boxes_hist, wlhs, model_offset, model_scale
                )
                mask_all = mask_all & (jnp.arange(T)[None, :, None] < t)
                template, _ = _resample_b(
                    canon_all.reshape(B, T * N, 3),
                    mask_all.reshape(B, T * N),
                    template_size,
                    ks[:, 1],
                )
            elif "FIRSTANDPREVIOUS" in aggregation:
                prev_canon, prev_mask = _crop_b(
                    prev_pts, prev_valid, prev_boxes, wlhs, model_offset, model_scale
                )
                tmpl_pts = jnp.concatenate([first_canon, prev_canon], axis=1)
                tmpl_mask = jnp.concatenate([first_mask, prev_mask], axis=1)
                template, _ = _resample_b(tmpl_pts, tmpl_mask, template_size, ks[:, 1])
            elif "FIRST" in aggregation:
                tmpl_pts, tmpl_mask = first_canon, first_mask
                template, _ = _resample_b(tmpl_pts, tmpl_mask, template_size, ks[:, 1])
            else:  # PREVIOUS
                tmpl_pts, tmpl_mask = _crop_b(
                    prev_pts, prev_valid, prev_boxes, wlhs, model_offset, model_scale
                )
                template, _ = _resample_b(tmpl_pts, tmpl_mask, template_size, ks[:, 1])

            out = model.apply(
                variables,
                {"search_points": search, "template_points": template},
                train=False,
            )
            data = out["pred_box_data"]  # (B, np, 5)
            best_idx = jnp.argmax(data[:, :, 4], axis=1)  # (B,)
            best = jnp.take_along_axis(data, best_idx[:, None, None], axis=1)[:, 0]  # (B, 5)
            new_boxes = _decode_b(ref_boxes, best[:, :4], use_z)
            if use_all:
                boxes_hist = jax.lax.dynamic_update_slice_in_dim(
                    boxes_hist, new_boxes[:, None, :], t, axis=1
                )
                return (new_boxes, boxes_hist), (new_boxes, best[:, 4])
            return new_boxes, (new_boxes, best[:, 4])

        xs = (jnp.arange(1, T), row_keys.swapaxes(0, 1))
        if use_all:
            # history row 0 = the GT init box (host results[0]); later rows are
            # filled in as the scan predicts them (masked by f < t until then)
            hist0 = jnp.tile(init_boxes[:, None, :], (1, T, 1))
            (_, _), (boxes, scores) = jax.lax.scan(step, (init_boxes, hist0), xs)
        else:
            _, (boxes, scores) = jax.lax.scan(step, init_boxes, xs)
        boxes = jnp.concatenate([init_boxes[:, None], boxes.swapaxes(0, 1)], axis=1)
        scores = jnp.concatenate(
            [jnp.full((B, 1), jnp.inf), scores.swapaxes(0, 1)], axis=1
        )
        return boxes, scores  # (B, T, 4), (B, T)

    if batched:
        return jax.jit(track_batched)

    def track_one(variables, pcs, counts, init_box, wlh, key, gt_boxes=None):
        boxes, scores = track_batched(
            variables, pcs[None], counts[None], init_box[None], wlh[None], key[None],
            None if gt_boxes is None else gt_boxes[None],
        )
        return boxes[0], scores[0]

    return jax.jit(track_one)


class DeviceTrackingEvaluator:
    """Host wrapper: pads tracklets to fixed (B, T, N) buckets, runs the device
    tracker, and scores Success/Precision on host with the exact reference metric.

    ``max_points`` bounds per-frame cloud size (frames larger than this are randomly
    subsampled on host once, before upload). Tracklet lengths are padded up to the
    next multiple of ``frame_bucket`` so XLA recompiles only per bucket, not per
    tracklet length.

    Reuse one evaluator instance across batches/epochs: the tracker is traced and
    compiled once per instance (tracing the whole-tracklet scan is expensive), after
    which a 512-frame batch executes in under a second on a v5e chip.
    """

    def __init__(self, cfg, model, variables, max_points: int = 16384,
                 frame_bucket: int = 32, batch_size: int = 8, seed: int = 1,
                 logger=None, quantize: bool = True, mesh=None, output_dir=None,
                 axis: str = "data"):
        from .metrics import Evaluator

        self.cfg = cfg
        self.variables = variables
        # multi-chip inference: tracklets are embarrassingly parallel, so the
        # dispatch batch shards over the mesh's batch axis (``axis``) and the
        # fused Pallas kernels shard_map over the same axis (ops/mesh_ctx.py)
        self.mesh = mesh
        self.axis = str(axis)
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.axis not in mesh.axis_names:
                raise ValueError(
                    f"mesh axes {mesh.axis_names} have no '{self.axis}' axis; "
                    f"pass axis=<your batch axis name>"
                )
            n_rows = mesh.shape[self.axis]  # only the named axis shards the batch
            if batch_size % n_rows:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the {n_rows}-way "
                    f"'{self.axis}' mesh axis"
                )
            self._shard = NamedSharding(mesh, P(self.axis))
            self.variables = jax.device_put(variables, NamedSharding(mesh, P()))
        self.max_points = int(max_points)
        self.frame_bucket = int(frame_bucket)
        self.batch_size = int(batch_size)
        self.seed = seed
        self.logger = logger
        self.quantize = bool(quantize)
        self.track_fn = make_device_tracker(
            model, cfg.DATA_CONFIG, cfg.TEST, batched=True,
            quantized_points=self.quantize,
        )
        self._needs_gt = (
            "PREVIOUS_RESULT"
            not in str(cfg.TEST.get("REF_BOX", "previous_result")).upper()
        )
        self.evaluator = Evaluator(ref_coord=str(cfg.DATA_CONFIG.get("REF_COOR", "lidar")))
        try:
            from .. import native as _native

            self._native = _native if _native.available() else None
        except Exception:
            self._native = None
        if str(cfg.DATA_CONFIG.get("REF_COOR", "lidar")).lower() != "lidar":
            self._native = None  # C++ scorer implements the lidar BEV footprint

        self._pcd_dir = None
        self._fp = None
        self._tracklet_num = 0
        self.set_output_dir(output_dir)

    def set_output_dir(self, output_dir):
        """(Re)bind the on-disk result dumps to ``output_dir`` — the same output
        tree the host evaluator writes (reference eval_tracking_utils.py):
        ``final_result/data/track_result.txt`` with one
        ``scene frame tracklet corners(24)`` line per frame, and (TEST.SAVE_PCD,
        reference :282-299) per-frame candidate clouds under ``pcd/``. The
        in-scan candidate clouds never leave the device, so the pcd dump
        recomputes the canonical crop + resample on host from the same
        crop-reference boxes the scan used (the predicted trajectory).
        Called again by --eval_all when the cached evaluator is reused for a new
        epoch's result dir."""
        from pathlib import Path

        if self._fp is not None:
            self._fp.close()
            self._fp = None
        self._pcd_dir = None
        self._tracklet_num = 0
        if output_dir is None:
            return
        from .evaluator import result_file_name

        final_dir = Path(output_dir) / "final_result" / "data"
        final_dir.mkdir(parents=True, exist_ok=True)
        self._fp = open(final_dir / result_file_name(), "w")
        if bool(self.cfg.TEST.get("SAVE_PCD", False)):
            self._pcd_dir = Path(output_dir) / "pcd"
            self._pcd_dir.mkdir(parents=True, exist_ok=True)

    def close(self):
        """Release the track_result file handle (kept open across tracklets for
        per-tracklet appends). eval_one_epoch_device calls this when the epoch
        finishes; a cached evaluator rebinds via set_output_dir next epoch."""
        self.set_output_dir(None)

    def __del__(self):  # pragma: no cover — belt and braces for direct users
        try:
            self.close()
        except Exception:
            pass

    @staticmethod
    def box_to_vec(box) -> np.ndarray:
        yaw = np.arctan2(box.rotation_matrix[1, 0], box.rotation_matrix[0, 0])
        return np.array([*box.center, yaw], np.float32)

    def _pad_tracklet(self, pcs, T_pad, n_pad=None):
        rng = np.random.default_rng(self.seed)
        N = n_pad if n_pad is not None else self.max_points
        dtype = np.int16 if self.quantize else np.float32
        out = np.zeros((T_pad, N, 3), dtype)
        counts = np.zeros((T_pad,), np.int32)
        for t, pc in enumerate(pcs):
            pc = np.asarray(pc, np.float32)
            if pc.shape[0] > N:
                pc = pc[rng.choice(pc.shape[0], N, replace=False)]
            if self.quantize:
                pc = np.clip(np.round(pc / QUANT_SCALE), -32768, 32767).astype(np.int16)
            out[t, : pc.shape[0]] = pc
            counts[t] = pc.shape[0]
        return out, counts

    def dispatch_batch(self, tracklets):
        """Pack + asynchronously dispatch a batch of tracklets to the device.
        Returns an opaque handle for ``finish_batch``; the upload and the whole
        tracklet scan queue behind earlier work, so host scoring of batch k can
        overlap the device execution of batch k+1.

        The batch dim is padded up to ``batch_size`` (last tracklet repeated) so
        the final partial batch of an epoch reuses the already-compiled (B, T, N)
        shape instead of forcing a second whole-scan compile; padded rows are
        dropped before scoring."""
        if len(tracklets) > self.batch_size:
            # a silent B > batch_size would trigger a second whole-scan compile
            # (30-600 s); fail loudly — track_batch chunks for you
            raise ValueError(
                f"dispatch_batch got {len(tracklets)} tracklets > batch_size="
                f"{self.batch_size}; use track_batch (chunks internally) or a "
                "larger batch_size"
            )
        T_max = max(len(pcs) for pcs, _, _ in tracklets)
        T_pad = max(2, -(-T_max // self.frame_bucket) * self.frame_bucket)
        n_real = len(tracklets)
        B = max(n_real, self.batch_size)

        # bucket the point dim to the batch's actual maximum (multiples of 256):
        # zero padding is pure upload waste, and the host->device transfer is the
        # end-to-end bottleneck on tunnel/PCIe-attached hosts
        n_max = max(
            min(len(np.asarray(pc)), self.max_points)
            for pcs, _, _ in tracklets for pc in pcs
        )
        n_pad = min(self.max_points, max(256, -(-n_max // 256) * 256))

        dtype = np.int16 if self.quantize else np.float32
        pcs_arr = np.zeros((B, T_pad, n_pad, 3), dtype)
        counts = np.zeros((B, T_pad), np.int32)
        init_boxes = np.zeros((B, 4), np.float32)
        wlhs = np.zeros((B, 3), np.float32)
        gt_arr = np.zeros((B, T_pad, 4), np.float32) if self._needs_gt else None
        for b in range(B):
            pcs, boxes, _ = tracklets[min(b, n_real - 1)]
            pcs_arr[b], counts[b] = self._pad_tracklet(pcs, T_pad, n_pad)
            init_boxes[b] = self.box_to_vec(boxes[0])
            wlhs[b] = boxes[0].wlh
            if gt_arr is not None:
                vecs = np.stack([self.box_to_vec(g) for g in boxes])
                gt_arr[b, : len(boxes)] = vecs
                gt_arr[b, len(boxes):] = vecs[-1]  # pad frames reuse the last GT
        keys = jax.random.split(jax.random.PRNGKey(self.seed), B)

        if self._shard is not None:
            pcs_arr, counts, init_boxes, wlhs, keys = (
                jax.device_put(x, self._shard)
                for x in (pcs_arr, counts, init_boxes, wlhs, keys)
            )
            if gt_arr is not None:
                gt_arr = jax.device_put(gt_arr, self._shard)

        # Scope the fused-kernel mesh context to this dispatch: the evaluator's
        # OWN mesh (or None) governs the trace, not whatever a training step
        # leaked into the process-global context — a meshless evaluator on a
        # multi-device backend must keep the round-3 jnp-fallback behavior
        # (its batch_size need not divide a leaked train mesh).
        from ..ops import mesh_ctx

        with mesh_ctx.use_mesh(self.mesh, self.axis):
            if gt_arr is None:
                boxes_dev, scores_dev = self.track_fn(
                    self.variables, pcs_arr, counts, init_boxes, wlhs, keys
                )
            else:
                boxes_dev, scores_dev = self.track_fn(
                    self.variables, pcs_arr, counts, init_boxes, wlhs, keys, gt_arr
                )
        return (boxes_dev, wlhs, tracklets)

    def finish_batch(self, handle):
        boxes_dev, wlhs, tracklets = handle
        boxes_out = np.asarray(jax.block_until_ready(boxes_dev))
        return self._score(boxes_out, wlhs, tracklets)

    def track_batch(self, tracklets):
        """tracklets: list of (pcs, gt_boxes, annos). Returns per-tracklet predicted
        geo.Box lists; updates metric accumulators. Chunks into ``batch_size``
        groups so the compiled (B, T, N) shape is reused."""
        results = []
        for i in range(0, len(tracklets), self.batch_size):
            chunk = tracklets[i : i + self.batch_size]
            results.extend(self.finish_batch(self.dispatch_batch(chunk)))
        return results

    def _save_pcds(self, pcs, gt_boxes, results, annos):
        """Per-frame candidate-cloud dumps (TEST.SAVE_PCD). Recomputes the
        canonical crop+resample on host from the crop-reference boxes, then
        rotates/translates back to world — the reference's save_pts_pcd
        semantics with the device loop's predicted trajectory."""
        from .evaluator import save_candidate_pcd

        data_cfg, test_cfg = self.cfg.DATA_CONFIG, self.cfg.TEST
        ref_mode = str(test_cfg.get("REF_BOX", "previous_result")).upper()
        offset = float(data_cfg.get("SEARCH_BB_OFFSET", 0.0))
        scale = float(data_cfg.get("SEARCH_BB_SCALE", 1.25))
        for t in range(1, len(pcs)):
            if "PREVIOUS_RESULT" in ref_mode:
                ref_box = results[t - 1]
            elif "PREVIOUS_GT" in ref_mode:
                ref_box = gt_boxes[t - 1]
            else:
                ref_box = gt_boxes[t]
            crop, _, _ = geo.crop_center_pc(
                np.asarray(pcs[t], np.float32), ref_box, gt_box=gt_boxes[t],
                offset=offset, scale=scale,
            )
            crop = geo.regularize_pc(
                crop, int(data_cfg["SEARCH_INPUT_SIZE"]), istrain=False
            )
            anno = annos[t] if annos is not None and t < len(annos) else {}
            save_candidate_pcd(
                self._pcd_dir, crop, ref_box, anno,
                default_scene=self._tracklet_num, default_frame=t,
            )

    def _score(self, boxes_out, wlhs, tracklets):

        all_results = []
        for b, (pcs, gt_boxes, annos) in enumerate(tracklets):
            T = len(pcs)
            results = [
                geo.Box(
                    center=boxes_out[b, t, :3].astype(np.float64),
                    wlh=np.asarray(gt_boxes[0].wlh, np.float64),
                    orientation=geo.Quaternion(
                        axis=[0, 0, 1], radians=float(boxes_out[b, t, 3])
                    ),
                )
                for t in range(T)
            ]
            with self.evaluator:
                if self._native is not None:
                    # batched C++ scoring: the python polygon clipper costs ~1 ms
                    # per frame and would dominate the whole device-loop eval
                    gt7 = np.stack(
                        [
                            np.concatenate(
                                [self.box_to_vec(g)[:3], np.asarray(g.wlh, np.float32),
                                 self.box_to_vec(g)[3:4]]
                            )
                            for g in gt_boxes
                        ]
                    )
                    pred7 = np.concatenate(
                        [
                            boxes_out[b, :T, :3],
                            np.broadcast_to(wlhs[b], (T, 3)),
                            boxes_out[b, :T, 3:4],
                        ],
                        axis=1,
                    ).astype(np.float32)
                    ious, dists = self._native.box_iou3d_batch(gt7, pred7)
                    for ov, ds in zip(ious, dists):
                        for acc in (self.evaluator.Success_main, self.evaluator.Success_batch):
                            acc.add_overlap(float(ov))
                        for acc in (self.evaluator.Precision_main, self.evaluator.Precision_batch):
                            acc.add_accuracy(float(ds))
                else:
                    for t in range(T):
                        self.evaluator.update_iou(gt_boxes[t], results[t])
            # 1-based tracklet ids, incremented BEFORE writing — same convention
            # as the host evaluator's batch_num (evaluator.py), so the two
            # loops' track_result files are row-compatible
            self._tracklet_num += 1
            if self._pcd_dir is not None:
                self._save_pcds(pcs, gt_boxes, results, annos)
            if self._fp is not None:
                from .evaluator import anno_scene_frame

                for t in range(T):
                    anno = annos[t] if annos is not None and t < len(annos) else {}
                    scene, _, frame = anno_scene_frame(
                        anno, default_scene=-1, default_frame=t
                    )
                    flat = np.concatenate(results[t].corners().T, axis=0).tolist()
                    self._fp.write(
                        " ".join(map(str, [scene, frame, self._tracklet_num] + flat))
                        + "\n"
                    )
                self._fp.flush()
            all_results.append(results)
        return all_results

    def summary(self):
        return {
            "success": self.evaluator.Success_main.average,
            "precision": self.evaluator.Precision_main.average,
            "frames": self.evaluator.Success_main.count,
        }


def eval_one_epoch_device(cfg, model, variables, dataloader, epoch_id="?", logger=None,
                          max_points: int = 16384, batch_size: int = 8,
                          result_dir=None, _evaluator_cache: dict = None):
    """Device-loop twin of eval_one_epoch: groups test tracklets into device batches.
    Returns (success, precision, frames_per_second).

    Pass the same dict as ``_evaluator_cache`` across calls (e.g. eval-during-
    training) to reuse one compiled tracker — only the variables are swapped;
    metric accumulators reset per call."""
    import time

    from .metrics import Evaluator

    emit = logger.info if logger is not None else print
    if _evaluator_cache is not None and "ev" in _evaluator_cache:
        ev = _evaluator_cache["ev"]
        ev.variables = variables
        ev.evaluator = Evaluator(ref_coord=str(cfg.DATA_CONFIG.get("REF_COOR", "lidar")))
        ev.set_output_dir(result_dir)  # --eval_all: each epoch's own result tree
    else:
        ev = DeviceTrackingEvaluator(
            cfg, model, variables, max_points=max_points, batch_size=batch_size,
            logger=logger, output_dir=result_dir,
        )
        if _evaluator_cache is not None:
            _evaluator_cache["ev"] = ev
    # two-stage pipeline: batch k+1's upload+scan queue on the device while the
    # host blocks on and scores batch k
    pending, in_flight, n_frames = [], None, 0
    start = time.perf_counter()
    for batch in dataloader:
        for trk in batch:
            pending.append(trk)
            n_frames += len(trk[0])
            if len(pending) == batch_size:
                handle = ev.dispatch_batch(pending)
                pending = []
                if in_flight is not None:
                    ev.finish_batch(in_flight)
                in_flight = handle
    if pending:
        handle = ev.dispatch_batch(pending)
        if in_flight is not None:
            ev.finish_batch(in_flight)
        in_flight = handle
    if in_flight is not None:
        ev.finish_batch(in_flight)
    ev.close()  # don't leak the track_result handle across --eval_all epochs
    elapsed = time.perf_counter() - start
    # multi-host: each process tracked its tracklet shard; merge the raw
    # per-frame metric lists and recompute the global AUCs (no-op single-process)
    from .metrics import merged_main_metrics

    succ, prec, total_frames = merged_main_metrics(ev.evaluator)
    emit(
        f"[device eval] epoch {epoch_id}: Succ/Prec {succ:.1f}/{prec:.1f}  "
        f"({total_frames} frames; local {n_frames} in {elapsed:.1f}s = "
        f"{n_frames / elapsed:.1f} fps)"
    )
    return succ, prec, n_frames / elapsed
