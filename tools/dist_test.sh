#!/usr/bin/env bash
# Multi-chip eval launcher (ref: tools/dist_test.sh). Single SPMD process.
CONFIG=$1
CHECKPOINT=$2
GPUS=$3
shift 3 || true
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
