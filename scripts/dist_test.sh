#!/usr/bin/env bash
# Multi-host detection evaluation launcher — the analog of the reference's
# tools/dist_test.sh. Run once per host (JAX SPMD), same env contract as
# scripts/dist_train.sh; each host evaluates its dataset shard and rank 0
# gathers results (iif_tpu/parallel/mesh.py multihost gather).
#
#   NUM_HOSTS=4 HOST_ID=0 COORDINATOR=host0:9876 \
#     scripts/dist_test.sh CONFIG CHECKPOINT --eval bbox segm
set -eu

CONFIG=$1
CHECKPOINT=$2
shift 2

if [ -n "${COORDINATOR:-}" ]; then
  export JAX_COORDINATOR_ADDRESS="$COORDINATOR"
  export JAX_NUM_PROCESSES="${NUM_HOSTS:?set NUM_HOSTS with COORDINATOR}"
  export JAX_PROCESS_ID="${HOST_ID:?set HOST_ID with COORDINATOR}"
fi

PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
python -m iif_tpu.cli.test_det "$CONFIG" "$CHECKPOINT" "$@"
