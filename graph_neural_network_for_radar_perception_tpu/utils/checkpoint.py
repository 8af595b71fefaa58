"""Checkpointing: params + optimiser state + step, with async save.

The reference torch.save()s only the model state_dict into a per-run
epoch-ms directory and never checkpoints optimiser/scheduler state
(modules/neural_net/gnn/training.py:9-18,102-104; SURVEY.md §5).  Here the
full TrainState round-trips through Orbax (async on TPU), so resume is
exact — including momentum buffers and the LR-schedule step.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def run_dir(base_dir: str) -> str:
    """Reference naming: directory named by epoch milliseconds
    (training.py:9-14)."""
    d = os.path.join(base_dir, str(round(time.time() * 1000)))
    os.makedirs(d, exist_ok=True)
    return d


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params_msgpack(params, path: str):
    """Light-weight single-file params dump (flax serialization) for
    weight-only exports, the analog of the reference's state_dict file."""
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params_msgpack(template, path: str):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
