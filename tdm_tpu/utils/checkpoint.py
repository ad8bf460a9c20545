"""Checkpoint / resume via orbax — the accelerate `save_state` replacement.

Reference surface (`SURVEY.md §5 checkpoint/resume`):
  * `accelerator.save_state(output_dir/checkpoint-{step})` every
    `--checkpointing_steps` with `--checkpoints_total_limit` rotation
    (`src/main.py:563-587`)
  * resume: `--resume_from_checkpoint latest` scans `checkpoint-*` dirs and
    restores models+optimizers+step (`src/main.py:379-401`)

Here the whole `TrainState` (student, critic, both optimizer states, EMA,
step) is one pytree; orbax writes it asynchronously (training continues
while the previous checkpoint flushes) and restores it sharded — each
device reads only its own FSDP shard, no host-RAM staging of the full model.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """checkpoint-{step} directories under `output_dir` with rotation —
    directory naming matches the reference so tooling/resume conventions
    carry over."""

    def __init__(
        self,
        output_dir: str,
        *,
        total_limit: Optional[int] = None,
        async_save: bool = True,
    ):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=total_limit,
            step_prefix="checkpoint",
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.output_dir, options=opts)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of `state_like` (an
        abstract or concrete TrainState pytree)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.output_dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self) -> None:
        self._mgr.close()


def resolve_resume_step(output_dir: str, resume: str) -> Optional[int]:
    """The `--resume_from_checkpoint` convention (`src/main.py:379-401`):
    'latest' scans checkpoint-* dirs; otherwise parse the step from the
    given name. Returns None when nothing to resume."""
    if resume != "latest":
        m = re.search(r"checkpoint[-_](\d+)", resume)
        if not m:
            raise ValueError(f"cannot parse step from {resume!r}")
        return int(m.group(1))
    if not os.path.isdir(output_dir):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(output_dir)
        if (m := re.fullmatch(r"checkpoint[-_](\d+)", d))
    ]
    return max(steps) if steps else None
