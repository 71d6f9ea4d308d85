"""Orbax checkpointing of params/optimizer state.

A genuine capability-add over the reference, which never persists model
weights (no ``torch.save`` anywhere — SURVEY.md §5 "Checkpoint / resume");
its only resume mechanism is the label/parameter pickle cache, which
:mod:`gn_ode_sir_tpu.utils.labels` keeps intact.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save_checkpoint(directory: str, state: Any, name: str = "state") -> str:
    """Save a pytree (e.g. {'params':..., 'opt_state':..., 'epoch':...})."""
    path = os.path.abspath(os.path.join(directory, name))
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, state, force=True)
    checkpointer.wait_until_finished()
    return path


def restore_checkpoint(directory: str, target: Any | None = None, name: str = "state"):
    """Restore a pytree; pass ``target`` with matching structure when known."""
    path = os.path.abspath(os.path.join(directory, name))
    checkpointer = ocp.StandardCheckpointer()
    if target is not None:
        return checkpointer.restore(path, target)
    return checkpointer.restore(path)
