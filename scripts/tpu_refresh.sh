#!/usr/bin/env bash
# Re-measure everything TPU-gated, in dependency order — the staged round-4/5
# tasks (docs/ROUND4.md + docs/ROUND5.md). Run from the repo root on a machine
# whose TPU tunnel relay is alive (bench.py's check_tpu_reachable fails fast
# otherwise). STRICTLY one TPU process at a time: each step waits for the
# previous to exit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/6: regenerate compilation-cache seeds for the current trace paths"
python tools/warmup.py --train --seed-out cache_seeds

echo "== 2/6: headline bench (expect >= 2250 fps median; watch the dispatch-latency probes)"
python bench.py

echo "== 3/6: ptt_large stretch bench (round-3: 617 fps; record the similarity-decomposition delta)"
python bench.py --cfg_file tools/cfgs/kitti_models/ptt_large.yaml

echo "== 4/6: training step time + MFU, ptt + ptt_large (mixed precision default-on + similarity decomposition)"
python tools/train_bench.py

echo "== 5/6: fused-kernel A/B on real tracking crops (now with the round-5 eval crop slack)"
python tools/fused_ab.py

echo "== 6/6: train the stronger agreement asset (longer schedule)"
python tools/train_tracking.py \
    --cfg_file tools/cfgs/synthetic_models/ptt_synth_strong.yaml \
    --extra_tag ckpt_asset_r5 --ckpt_save_interval 5 \
    --set TRAIN.WITH_EVAL.ENABLE False
JAX_PLATFORMS=cpu python tests/assets/make_trained_ckpt.py \
    output/synthetic_models/ptt_synth_strong/ckpt_asset_r5/ckpt

echo "Done. Update docs/PERFORMANCE.md + README with the measured numbers,"
echo "re-run tools/parity_decomposition.py for the new asset, and commit"
echo "cache_seeds/ + tests/assets/ptt_synth_trained.npz."
