#!/usr/bin/env bash
# SLURM detection-eval launcher — the analog of the reference's
# tools/slurm_test.sh. Same cluster auto-detection as slurm_train.sh.
#
#   scripts/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [extra args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
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
    python -u -m iif_tpu.cli.test_det "${CONFIG}" "${CHECKPOINT}" ${PY_ARGS}
