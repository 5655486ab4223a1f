"""Fused-SA eval path: metric-level A/B on the real chip (VERDICT round 2, ask #3).

The TPU eval path (source of every quoted number) runs the fused Pallas SA kernel
(ops/pallas_sa.py); CI only exercises it per-module in the CPU interpreter. This
tool closes the gap "kernel matches in interpreter" -> "the quoted metrics are
right": on the actual TPU, with the committed trained checkpoint, it runs

  1. the synthetic benchmark eval twice — fused kernels enabled vs force-disabled
     (pallas_sa.DISABLE_FUSED; identical variables/tracklets/keys) — and reports
     |ΔSuccess| / |ΔPrecision|;
  2. a full-model forward A/B on one batch — reports the numeric divergence of
     pred_box_data and how many proposals' argmax selection flipped.

Paste the output into docs/PERFORMANCE.md ("Fused SA kernel — metric validation").

Usage: python tools/fused_ab.py   (requires a TPU; exits if none)
"""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

ASSET = REPO_ROOT / "tests" / "assets" / "ptt_synth_trained.npz"


def main():
    import jax
    import numpy as np

    if jax.devices()[0].platform != "tpu":
        sys.exit("fused_ab.py needs the real TPU (fused path disabled elsewhere)")

    import jax.numpy as jnp

    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
    from ptt_tpu.nn import build_network
    from ptt_tpu.ops import pallas_sa
    from ptt_tpu.train.checkpoint import load_variables_npz

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    model = build_network(cfg.MODEL)
    params, batch_stats, meta = load_variables_npz(ASSET)
    variables = {"params": params, "batch_stats": batch_stats}

    eval_cfg = dict(cfg.DATA_CONFIG)
    eval_cfg.update(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=8,
        FRAMES_PER_TRACKLET=24,
        SYNTH_SEED=11,
    )
    _, loader = build_dataloader(eval_cfg, ["Car"], batch_size=1, training=False)
    tracklets = [trk for batch in loader for trk in batch]

    # ---- 1. metric A/B through the device tracker
    results = {}
    for fused in (True, False):
        pallas_sa.DISABLE_FUSED = not fused
        ev = DeviceTrackingEvaluator(
            cfg, model, variables, max_points=1024, batch_size=8
        )
        ev.track_batch(tracklets)
        results[fused] = ev.summary()
        print(f"fused={fused}: Succ/Prec "
              f"{results[fused]['success']:.2f}/{results[fused]['precision']:.2f}",
              file=sys.stderr)
    pallas_sa.DISABLE_FUSED = False
    a, b = results[True], results[False]

    # ---- 2. full-model forward A/B on one batch of REAL tracking crops (random
    # clouds are far out of distribution: score landscapes go flat and every tiny
    # numeric difference flips the argmax, which says nothing about tracking)
    from ptt_tpu.core import geometry as geo

    searches, templates = [], []
    for pcs, boxes, _ in tracklets:
        # gt_box: eval-time search crops carry the reference's 0.6*length slack
        # (round-5 lockstep finding) — bench on the same distribution
        s, _, _ = geo.crop_center_pc(
            np.asarray(pcs[1], np.float64), boxes[0], gt_box=boxes[1],
            offset=float(cfg.DATA_CONFIG.get("SEARCH_BB_OFFSET", 0.0)),
            scale=float(cfg.DATA_CONFIG.get("SEARCH_BB_SCALE", 1.25)),
        )
        searches.append(geo.regularize_pc(s, 1024, istrain=False))
        t = geo.get_model(
            [pcs[0]], [boxes[0]],
            offset=float(cfg.DATA_CONFIG.get("MODEL_BB_OFFSET", 0.0)),
            scale=float(cfg.DATA_CONFIG.get("MODEL_BB_SCALE", 1.25)),
        )
        templates.append(geo.regularize_pc(t, 512, istrain=False))
    batch = {
        "search_points": jnp.asarray(np.stack(searches), jnp.float32),
        "template_points": jnp.asarray(np.stack(templates), jnp.float32),
    }
    outs = {}
    for fused in (True, False):
        pallas_sa.DISABLE_FUSED = not fused
        fn = jax.jit(lambda v, bb: model.apply(v, bb, train=False))
        outs[fused] = {k: np.asarray(v) for k, v in fn(variables, batch).items()}
    pallas_sa.DISABLE_FUSED = False

    pf, pj = outs[True]["pred_box_data"], outs[False]["pred_box_data"]
    # compare the per-sample argmax proposal (the only thing the tracker consumes)
    best_f = pf[np.arange(8), pf[:, :, 4].argmax(1)]
    best_j = pj[np.arange(8), pj[:, :, 4].argmax(1)]
    flips = int((pf[:, :, 4].argmax(1) != pj[:, :, 4].argmax(1)).sum())
    box_delta = np.abs(best_f[:, :4] - best_j[:, :4]).max()
    raw_delta = np.abs(pf - pj).max()
    rel = np.abs(pf - pj).mean() / (np.abs(pj).mean() + 1e-9)

    print()
    print("| Measurement | fused | jnp | delta |")
    print("|---|---|---|---|")
    print(f"| eval Success (192 frames) | {a['success']:.2f} | {b['success']:.2f} "
          f"| {abs(a['success'] - b['success']):.2f} |")
    print(f"| eval Precision | {a['precision']:.2f} | {b['precision']:.2f} "
          f"| {abs(a['precision'] - b['precision']):.2f} |")
    print(f"| forward pred_box_data max abs diff | | | {raw_delta:.4g} |")
    print(f"| forward mean rel diff | | | {rel:.4g} |")
    print(f"| argmax-proposal flips (of 8) | | | {flips} |")
    print(f"| selected-box max abs diff | | | {box_delta:.4g} |")


if __name__ == "__main__":
    main()
