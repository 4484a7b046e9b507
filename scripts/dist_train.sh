#!/usr/bin/env bash
# Multi-host detection training launcher — the analog of the reference's
# tools/dist_train.sh (torch.distributed.launch). JAX is single-process-
# per-host SPMD: run THIS script once on EVERY host of the slice, not N
# times on one host.
#
#   NUM_HOSTS=4 HOST_ID=0 COORDINATOR=host0:9876 \
#     scripts/dist_train.sh CONFIG [train_det args...]
#
# On a Cloud TPU pod slice or under SLURM, skip the env vars entirely —
# jax.distributed auto-detects the cluster (see iif_tpu/parallel/mesh.py,
# initialize_distributed) and each host loads its own data shard.
set -eu

CONFIG=$1
shift

if [ -n "${COORDINATOR:-}" ]; then
  export JAX_COORDINATOR_ADDRESS="$COORDINATOR"
  export JAX_NUM_PROCESSES="${NUM_HOSTS:?set NUM_HOSTS with COORDINATOR}"
  export JAX_PROCESS_ID="${HOST_ID:?set HOST_ID with COORDINATOR}"
fi

PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
python -m iif_tpu.cli.train_det "$CONFIG" "$@"
