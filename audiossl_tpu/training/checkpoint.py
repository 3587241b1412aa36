"""Orbax checkpointing + crash-restart resume.

The reference relies on Lightning ``ModelCheckpoint`` (every N epochs +
``save_last``) and every driver auto-resumes from ``last.ckpt``
(reference ``methods/atst/train.py:25-35``). Equivalent here: an orbax
``CheckpointManager`` keeping periodic + latest steps, and
``restore_latest`` returning the step to resume from (0 if fresh).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for train states."""

    def __init__(self, directory: str, save_interval_steps: int = 1000,
                 max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            _abs(directory),
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval_steps,
                max_to_keep=max_to_keep,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if step in self._mgr.all_steps():
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(_to_pytree(state)),
            force=force)
        return bool(saved)

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(abstract_state)))
        return _from_pytree(abstract_state, restored)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _to_pytree(state):
    """NamedTuple train states -> plain dict pytrees (orbax-friendly)."""
    if hasattr(state, "_asdict"):
        return {k: _to_pytree(v) for k, v in state._asdict().items()}
    return state


def _from_pytree(template, tree):
    if hasattr(template, "_asdict"):
        fields = {k: _from_pytree(getattr(template, k), tree[k])
                  for k in template._fields}
        return type(template)(**fields)
    return tree


def save_params(directory: str, params) -> None:
    """One-shot save of a parameter tree (e.g. exported encoders)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(directory), params)
    ckptr.wait_until_finished()


def restore_params(directory: str, abstract_params=None):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(directory), abstract_params)
