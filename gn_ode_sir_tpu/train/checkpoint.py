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


def restore_with_layout_ladder(directory: str, target: dict,
                               optional_groups, name: str = "state"):
    """Restore a fit()-style state whose on-disk layout may be any
    generation: try ``target`` extended with every subset of the optional
    key-groups, most-keys-first (newest complete layout wins), and let the
    final bare-target attempt re-raise the real error if nothing matches.

    ``optional_groups`` is an ordered list of dicts of optional keys with
    example values (newest layout additions first) — e.g. the per-trial
    OOD vector, the best-params serving snapshot, the test wall time.
    Orbax's strict structure matching makes each failed rung a cheap
    directory read; one shared ladder keeps fit() and fit_ensemble() from
    drifting apart (they previously duplicated this logic).
    """
    from itertools import combinations

    groups = list(optional_groups)
    attempts, seen = [], set()
    for r in range(len(groups), -1, -1):
        for combo in combinations(range(len(groups)), r):
            extra = {}
            for gi in combo:
                extra.update(groups[gi])
            key = tuple(sorted(extra))
            if key not in seen:
                seen.add(key)
                attempts.append(extra)
    for extra in attempts[:-1]:
        try:
            return restore_checkpoint(directory, {**target, **extra}, name=name)
        except Exception:  # noqa: BLE001 — rung mismatch; try the next layout
            continue
    # the last attempt is the bare target: surface the real restore error
    return restore_checkpoint(directory, {**target, **attempts[-1]}, name=name)
