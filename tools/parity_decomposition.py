"""Host<->device eval deviation decomposition (VERDICT round 2, ask #1b).

Runs the committed trained checkpoint (tests/assets/ptt_synth_trained.npz) through
the host evaluator and the device tracker under each configuration axis and prints
a markdown table of |ΔSuccess| / |ΔPrecision| isolating every deviation source:

  - int16 upload quantization (device quantize on vs off — same RNG stream);
  - the RNG-stream deviation itself (host vs device at quantize=off);
  - each TEST.REF_BOX mode (previous_result / previous_gt / current_gt);
  - SHAPE_AGGREGATION='all' (the box-history-carry scan vs host concat).

Paste the output into docs/PARITY.md ("Host vs device eval decomposition").

Usage: python tools/parity_decomposition.py   (CPU by default; runs anywhere)
"""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

ASSET = REPO_ROOT / "tests" / "assets" / "ptt_synth_trained.npz"


def main():
    import jax

    if "--tpu" not in sys.argv:
        # CPU: same platform as CI; also keeps the decomposition comparable to
        # the committed agreement-test numbers (env JAX_PLATFORMS is overridden
        # by the TPU plugin's sitecustomize, so use the config knob)
        jax.config.update("jax_platforms", "cpu")
    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.eval import TrackingEvaluator
    from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
    from ptt_tpu.nn import build_network
    from ptt_tpu.train.checkpoint import load_variables_npz

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    model = build_network(cfg.MODEL)
    params, batch_stats, meta = load_variables_npz(ASSET)
    variables = {"params": params, "batch_stats": batch_stats}
    print(f"checkpoint: epoch {meta['epoch']}, recorded host "
          f"Succ/Prec {float(meta['host_success']):.2f}/"
          f"{float(meta['host_precision']):.2f}", file=sys.stderr)

    eval_cfg = dict(cfg.DATA_CONFIG)
    eval_cfg.update(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=8,
        FRAMES_PER_TRACKLET=24,
        SYNTH_SEED=11,
    )
    _, loader = build_dataloader(eval_cfg, ["Car"], batch_size=1, training=False)
    tracklets = [trk for batch in loader for trk in batch]

    def with_test(**overrides):
        mod = cfg.copy()
        mod.TEST = dict(mod.TEST)
        mod.TEST.update(overrides)
        return mod

    def host_eval(c):
        ev = TrackingEvaluator(c, model, variables, loader.dataset)
        for trk in tracklets:
            ev.test_tracklet(*trk)
        s = ev.summary()
        return s["success"], s["precision"]

    def device_eval(c, quantize=True):
        ev = DeviceTrackingEvaluator(
            c, model, variables, max_points=1024, batch_size=8, quantize=quantize
        )
        ev.track_batch(tracklets)
        s = ev.summary()
        return s["success"], s["precision"]

    rows = []

    def row(name, a, b):
        rows.append((name, a, b, abs(a[0] - b[0]), abs(a[1] - b[1])))
        print(f"  {name}: {a[0]:.2f}/{a[1]:.2f} vs {b[0]:.2f}/{b[1]:.2f}",
              file=sys.stderr)

    base_host = host_eval(cfg)
    dev_qon = device_eval(cfg, quantize=True)
    dev_qoff = device_eval(cfg, quantize=False)
    row("deployed: host vs device (int16 upload)", base_host, dev_qon)
    row("quantization alone: device f32 vs device int16", dev_qoff, dev_qon)
    row("RNG stream alone: host vs device (f32 upload)", base_host, dev_qoff)

    for mode in ("previous_gt", "current_gt"):
        c = with_test(REF_BOX=mode)
        row(f"REF_BOX={mode}: host vs device", host_eval(c), device_eval(c))

    c = with_test(SHAPE_AGGREGATION="all")
    row("SHAPE_AGGREGATION=all: host vs device", host_eval(c), device_eval(c))

    print()
    print("| Configuration | A Succ/Prec | B Succ/Prec | |ΔSucc| | |ΔPrec| |")
    print("|---|---|---|---|---|")
    for name, a, b, ds, dp in rows:
        print(f"| {name} | {a[0]:.2f} / {a[1]:.2f} | {b[0]:.2f} / {b[1]:.2f} "
              f"| {ds:.2f} | {dp:.2f} |")


if __name__ == "__main__":
    main()
