"""Multi-host (DCN) initialization.

One v5e-8 slice (the SURVEY §2.2 target) never needs this — all collectives
ride ICI inside a single process. For multi-host pods, JAX's standard
distributed runtime is the DCN layer: call :func:`init_distributed` once per
host before touching devices, then build meshes over ``jax.devices()`` as
usual — shardings laid out so the fast axes (data/edge here) map to ICI and
only the outermost axis crosses DCN.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX's distributed runtime (no-op when single-process).

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); returns
    True when multi-host mode was actually initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
