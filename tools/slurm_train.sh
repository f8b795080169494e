#!/usr/bin/env bash
# Slurm launcher (ref: tools/slurm_train.sh): one task per TPU host;
# jax.distributed.initialize() wires the pod.
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3 || true
srun -p "$PARTITION" --job-name="$JOB_NAME" --kill-on-bad-exit=1 \
    python "$(dirname "$0")/train.py" "$CONFIG" --multihost "$@"
