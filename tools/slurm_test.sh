#!/usr/bin/env bash
# Slurm eval launcher (ref: tools/slurm_test.sh).
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4 || true
srun -p "$PARTITION" --job-name="$JOB_NAME" --kill-on-bad-exit=1 \
    python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
