"""Checkpoint / resume (reference contract: `/root/reference/train.py:
307-320,434-442` — one file per save with iter, params for all 11 model
slots, and the 3 optimizer states).

Orbax-backed: the whole TrainState pytree (params + EMA + optimizer
states + step) is one checkpoint; `latest_step`/`restore` reproduce the
`--ckpt NAME` resume flow.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        """Sorted list of every retained checkpoint step (for post-hoc
        metric trajectories over a run, e.g. tools_fid_trajectory.py)."""
        return sorted(self._mngr.all_steps())

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure of `state_template` (an abstract or
        concrete TrainState with matching tree structure)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))
