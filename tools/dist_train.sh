#!/usr/bin/env bash
# Multi-host training launcher — the TPU-native counterpart of the
# reference's torchrun script (`MaXTron_Tube-Link/tools/dist_train.sh`).
#
# On TPU pods there is no torchrun: every host runs the SAME command and
# `jax.distributed.initialize()` discovers the topology from the TPU
# runtime metadata (or, on CPU/GPU clusters, from JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID). Typical pod usage:
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#       --command="cd /path/to/repo && tools/dist_train.sh configs/vipseg/maxtron_wc_r50.yaml"
#
# Single-host multi-chip needs no launcher at all — jit over the local mesh.
set -euo pipefail

CONFIG=$1
shift || true

exec python "$(dirname "$0")/train_net_video.py" \
    --config-file "$CONFIG" \
    --distributed \
    "$@"
