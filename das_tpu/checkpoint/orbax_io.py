"""Native checkpoint save/resume via orbax
(replaces mmcv CheckpointHook, ref exp_panoptic.py:214-217: interval=1,
max_keep_ckpts=20)."""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_keep: int = 20):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_keep, create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: Any, step: int):
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def restore(self, target: Any, step_or_path=None):
        step = step_or_path
        if step is None or step == 'latest':
            step = self.manager.latest_step()
        if isinstance(step, str) and step.isdigit():
            step = int(step)
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(target))

    def latest_step(self):
        return self.manager.latest_step()
