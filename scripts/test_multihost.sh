#!/usr/bin/env bash
# Multi-host evaluation launcher: every process evaluates its shard of the test
# tracklets through the device-resident tracker; Success/Precision merge globally
# via a device all_gather (the jax-native replacement of the reference's
# dist-eval path — pickle-tmpdir merge_results_dist, common_utils.py:309-330).
#
# Run on every host like scripts/train_multihost.sh; jax.distributed.initialize()
# discovers the coordinator (TPU metadata, or JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID on other clusters).
#
# Usage: scripts/test_multihost.sh <cfg_file> [extra test_tracking.py args...]

set -euo pipefail
CFG=${1:?usage: test_multihost.sh <cfg_file> [args...]}
shift
exec python tools/test_tracking.py --cfg_file "$CFG" --launcher jax "$@"
