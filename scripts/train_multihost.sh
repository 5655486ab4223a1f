#!/usr/bin/env bash
# Multi-host training launcher (the jax-native replacement of the reference's
# scripts/train_ddp.sh torch.distributed.launch wrapper).
#
# On TPU pods, run this same command on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`);
# jax.distributed.initialize() discovers the coordinator from the TPU metadata.
# On CPU/GPU clusters, export JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
# JAX_PROCESS_ID per host first.
#
# Usage: scripts/train_multihost.sh <cfg_file> [extra train_tracking.py args...]

set -euo pipefail
CFG=${1:?usage: train_multihost.sh <cfg_file> [args...]}
shift
exec python tools/train_tracking.py --cfg_file "$CFG" --launcher jax "$@"
