#!/usr/bin/env bash
# SLURM detection-training launcher — the analog of the reference's
# tools/slurm_train.sh. One srun task per host; jax.distributed reads the
# SLURM_* env (SlurmCluster auto-detection), so no rendezvous flags are
# needed beyond the srun allocation itself.
#
#   scripts/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [extra args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
HOSTS=${HOSTS:-2}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --nodes="${HOSTS}" \
    --ntasks="${HOSTS}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u -m iif_tpu.cli.train_det "${CONFIG}" --work-dir="${WORK_DIR}" ${PY_ARGS}
