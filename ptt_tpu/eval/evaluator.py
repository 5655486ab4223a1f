"""The autoregressive tracking evaluator (reference tools/eval_utils/
eval_tracking_utils.py:16-310).

Per tracklet: frame 0 is initialized from the GT box; every later frame crops the
search region around the previous *predicted* box, fuses the template from first +
previous predictions (TEST.SHAPE_AGGREGATION), runs the network, and decodes the
argmax-score proposal back to the world frame (get_box_by_offset).

TPU-first inference path: one jitted ``track_step(variables, search, template) ->
(box4, score)`` with the proposal argmax *inside* the compiled program, so exactly
five scalars cross the device->host boundary per frame — versus the reference's full
(64, 5) proposal download plus numpy argmax per frame (eval_tracking_utils.py:266).
Host work per frame is just the canonical-frame crop + resample (numpy, ~50k pts).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..utils import timer
from ..utils.common import AverageMeter
from .metrics import Evaluator


def result_file_name(process_index=None, process_count=None) -> str:
    """``track_result.txt``, rank-suffixed under multi-process eval: test
    tracklets shard per process (tools/test_tracking.py), so a shared mode-'w'
    file would have every rank truncating and interleaving into the same path."""
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return "track_result.txt"
    i = jax.process_index() if process_index is None else process_index
    return f"track_result.rank{i}.txt"


def anno_scene_frame(anno, default_scene, default_frame):
    """(scene, track_id, frame) from a dataset anno dict — the one fallback
    chain both evaluators use for result lines and pcd names."""
    scene = anno.get("scene", anno.get("scene_num", default_scene))
    track = anno.get("track_id", 0)
    frame = anno.get("frame", anno.get("frame_num", default_frame))
    return scene, track, frame


def save_candidate_pcd(pcd_dir, points_canonical, ref_box, anno,
                       default_scene, default_frame):
    """TEST.SAVE_PCD dump shared by both evaluators: the canonical candidate
    cloud rotated/translated back to the world frame by the crop's reference box
    (reference save_pts_pcd, eval_tracking_utils.py:282-299: candidate_PC is
    canonical; pc.rotate(ref.rotation_matrix); pc.translate(ref.center))."""
    from ..utils.file_io import save_pts_as_pcd

    world = points_canonical @ ref_box.rotation_matrix.T + ref_box.center
    scene, track, frame = anno_scene_frame(anno, default_scene, default_frame)
    save_pts_as_pcd(world, pcd_dir, name=f"{scene}_{track}_candidatePC_{frame}.pcd")


def make_track_step(model):
    """Jitted single-frame inference: apply the network and reduce to the best
    proposal on device. Returns (box_offset[4], score) as device scalars."""

    @jax.jit
    def track_step(variables, search_points, template_points):
        out = model.apply(
            variables,
            {"search_points": search_points, "template_points": template_points},
            train=False,
        )
        data = out["pred_box_data"][0]  # (np, 5) = [x, y, z, theta_deg, score]
        idx = jnp.argmax(data[:, 4])
        best = data[idx]
        return best[:4], best[4]

    return track_step


class TrackingEvaluator:
    """Per-tracklet tracking state machine (reference TrackingEvaluator, :54-310)."""

    def __init__(self, cfg, model, variables, dataset, logger=None, output_dir=None,
                 pcd_dir=None):
        self.cfg = cfg
        self.data_cfg = cfg.DATA_CONFIG
        self.test_cfg = cfg.TEST
        self.model = model
        self.variables = variables
        self.dataset = dataset
        self.logger = logger
        self.track_step = make_track_step(model)

        # native C++ crop for the per-frame host preprocessing when the toolchain
        # built it; exact-equivalent numpy fallback otherwise (test_native.py)
        try:
            from .. import native as _native

            self._native = _native if _native.available() else None
        except Exception:
            self._native = None

        self.evaluator = Evaluator(ref_coord=str(self.data_cfg.get("REF_COOR", "lidar")))
        self.frame_time = AverageMeter()
        self.batch_num = 0

        self._fp = None
        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            self._fp = open(output_dir / result_file_name(), "w")

        # TEST.SAVE_PCD: per-frame candidate-cloud dumps in the world frame
        # (reference save_pts_pcd, eval_tracking_utils.py:282-299; it writes to a
        # hardcoded ../output/pcd — here they land under the run's output dir).
        # eval_one_epoch passes the run-level pcd dir explicitly; a direct user
        # who gives only output_dir gets ``<output_dir>/pcd``, not a dir two
        # levels above what they asked for.
        self._pcd_dir = None
        if bool(self.test_cfg.get("SAVE_PCD", False)) and (
            pcd_dir is not None or output_dir is not None
        ):
            self._pcd_dir = Path(pcd_dir) if pcd_dir is not None else Path(output_dir) / "pcd"
            self._pcd_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- host preprocessing

    def _prepare_search(self, this_pc, this_box, results, gt_boxes, frame_id):
        ref_mode = str(self.test_cfg.get("REF_BOX", "previous_result")).upper()
        if "PREVIOUS_RESULT" in ref_mode:
            ref_box = results[-1]
        elif "PREVIOUS_GT" in ref_mode:
            ref_box = gt_boxes[frame_id - 1]
        elif "CURRENT_GT" in ref_mode:
            ref_box = this_box
        else:
            raise ValueError(
                "TEST.REF_BOX must be previous_result / previous_gt / current_gt"
            )
        offset = float(self.data_cfg.get("SEARCH_BB_OFFSET", 0.0))
        scale = float(self.data_cfg.get("SEARCH_BB_SCALE", 1.25))
        # The reference evaluator calls crop_center_pc WITH gt_box (prepare_search,
        # eval_tracking_utils.py:164-169), which routes the final crop through the
        # train-style ``offset + gt.wlh[1]*0.6`` slack (kitti_tracking_utils.py:321)
        # — the eval search region is ~0.6 object-lengths wider than the bare
        # (offset, scale) crop. Caught by the whole-loop lockstep
        # (tests/test_eval_lockstep.py); the pre-round-5 evaluators cropped tight.
        if self._native is not None:
            # the reference crop is a COMPOSITE: loose world-frame pre-crop
            # (2*offset, 4*scale AABB) INTERSECTED with the slacked canonical
            # crop. The slack (0.6*length on every axis) can poke outside the
            # pre-crop for long-low boxes (l > ~3.1*min(w, h)) — real KITTI
            # cars — so the pre-crop genuinely bounds membership and must run
            # here too, not just be assumed redundant.
            pre = geo.crop_pc(this_pc, ref_box, offset=2 * offset, scale=4 * scale)
            eff_offset = offset + 0.6 * float(np.asarray(this_box.wlh)[1])
            yaw = np.arctan2(ref_box.rotation_matrix[1, 0], ref_box.rotation_matrix[0, 0])
            box_vec = np.array([*ref_box.center, yaw], np.float32)
            pts, _ = self._native.crop_canonical(pre, box_vec, ref_box.wlh, eff_offset, scale)
        else:
            pts, _, _ = geo.crop_center_pc(
                this_pc, ref_box, gt_box=this_box, offset=offset, scale=scale
            )
        pts = geo.regularize_pc(pts, int(self.data_cfg["SEARCH_INPUT_SIZE"]), istrain=False)
        return ref_box, pts

    def _prepare_template(self, pcs, results, frame_id):
        mode = str(self.test_cfg.get("SHAPE_AGGREGATION", "firstandprevious")).upper()
        if "FIRSTANDPREVIOUS" in mode:
            sel_pcs = [pcs[0], pcs[frame_id - 1]]
            sel_boxes = [results[0], results[frame_id - 1]]
        elif "FIRST" in mode:
            sel_pcs, sel_boxes = [pcs[0]], [results[0]]
        elif "PREVIOUS" in mode:
            sel_pcs, sel_boxes = [pcs[frame_id - 1]], [results[frame_id - 1]]
        else:  # 'all' and the reference's fallback
            sel_pcs, sel_boxes = pcs[:frame_id], results
        template = geo.get_model(
            sel_pcs,
            sel_boxes,
            offset=float(self.data_cfg.get("MODEL_BB_OFFSET", 0.0)),
            scale=float(self.data_cfg.get("MODEL_BB_SCALE", 1.25)),
        )
        return geo.regularize_pc(
            template, int(self.data_cfg["TEMPLATE_INPUT_SIZE"]), istrain=False
        )

    # ------------------------------------------------------------------- tracking

    def test_tracklet(self, pcs, gt_boxes, annos, progress_cb=None):
        """Track one tracklet; updates metric accumulators per frame and returns the
        list of predicted boxes."""
        self.batch_num += 1
        results = []
        with self.evaluator:
            for i, (this_pc, this_box) in enumerate(zip(pcs, gt_boxes)):
                if i == 0:
                    results.append(this_box)  # GT seeds the track (reference :96-100)
                else:
                    t0 = time.perf_counter()
                    with timer.env("pre process"):
                        ref_box, search = self._prepare_search(
                            this_pc, this_box, results, gt_boxes, i
                        )
                        template = self._prepare_template(pcs, results, i)
                    with timer.env("model inference"):
                        offset4, score = self.track_step(
                            self.variables,
                            jnp.asarray(search[None], jnp.float32),
                            jnp.asarray(template[None], jnp.float32),
                        )
                        offset4 = np.asarray(jax.block_until_ready(offset4))
                    with timer.env("post process"):
                        box = geo.get_box_by_offset(
                            ref_box, offset4, bool(self.data_cfg.get("USE_Z_AXIS", False))
                        )
                    if self._pcd_dir is not None:
                        save_candidate_pcd(
                            self._pcd_dir, search, ref_box,
                            annos[i] if annos is not None and i < len(annos) else {},
                            default_scene=self.batch_num, default_frame=i,
                        )
                    results.append(box)
                    self.frame_time.update(time.perf_counter() - t0)

                self.evaluator.update_iou(this_box, results[-1])
                anno = annos[i] if annos is not None and i < len(annos) else {}
                self._save_result(anno, results[-1], frame_id=i)
                if progress_cb is not None:
                    progress_cb(self)
        return results

    def _save_result(self, anno, box, frame_id=-1):
        if self._fp is None:
            return
        scene, _, frame = anno_scene_frame(anno, default_scene=-1, default_frame=frame_id)
        flat = np.concatenate(box.corners().T, axis=0).tolist()
        self._fp.write(" ".join(map(str, [scene, frame, self.batch_num] + flat)) + "\n")

    @property
    def fps(self):
        return 1.0 / self.frame_time.avg if self.frame_time.count else 0.0

    def close(self):
        if self._fp is not None:
            self._fp.close()
            self._fp = None

    def summary(self):
        return {
            "success": self.evaluator.Success_main.average,
            "precision": self.evaluator.Precision_main.average,
            "fps": self.fps,
            "frames": self.evaluator.Success_main.count,
        }


def eval_one_epoch(cfg, model, variables, dataloader, epoch_id="?", logger=None,
                   result_dir=None, tb_log=None):
    """Run tracking eval over the whole test loader (reference eval_one_epoch,
    eval_tracking_utils.py:16-51). Returns (success, precision)."""
    emit = logger.info if logger is not None else print
    emit(f"*************** EPOCH {epoch_id} EVALUATION *****************")
    # per-epoch timer table, not cumulative across --eval_all epochs
    timer.reset()
    final_dir = Path(result_dir) / "final_result" / "data" if result_dir else None

    ev = TrackingEvaluator(
        cfg, model, variables, dataloader.dataset, logger=logger, output_dir=final_dir,
        pcd_dir=Path(result_dir) / "pcd" if result_dir else None,
    )
    start = time.perf_counter()
    n_frames = 0
    for batch in dataloader:  # one item = one whole tracklet
        for pcs, boxes, annos in batch:
            ev.test_tracklet(pcs, boxes, annos)
            n_frames += len(pcs)
            emit(
                f"tracklet {ev.batch_num}: batch Succ/Prec "
                f"{ev.evaluator.Success_batch.average:.1f}/"
                f"{ev.evaluator.Precision_batch.average:.1f}  "
                f"({ev.fps:.1f} fps)"
            )
    summary = ev.summary()
    ev.close()

    elapsed = time.perf_counter() - start
    # per-section timer table (reference prints it per tracklet,
    # eval_tracking_utils.py:104-108; once per epoch is the useful granularity)
    timer.print_stats(logger)
    # multi-host: merge the per-frame metric lists across the tracklet shards
    # (no-op single-process)
    from .metrics import merged_main_metrics

    succ, prec, total_frames = merged_main_metrics(ev.evaluator)
    emit(
        f"*************** Performance of EPOCH {epoch_id} *****************\n"
        f"mean Succ/Prec {succ:.1f}/{prec:.1f}  "
        f"({total_frames} frames, {elapsed:.1f}s local, "
        f"tracked at {summary['fps']:.1f} fps)"
    )
    if tb_log is not None:
        tb_log.add_scalar("metric/succ", succ, epoch_id)
        tb_log.add_scalar("metric/prec", prec, epoch_id)
    return succ, prec
