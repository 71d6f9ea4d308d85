"""Time-grid resampling: solver grid -> integer label times.

Static-gather replacement for the reference's per-step Python copy loops
``get_sir_t_nodes`` / ``get_sir_t_nodes_torch`` (``ode_nn.py:235-261``):
label time t (integer, 0..maxTime-1) reads solver grid index
``int(t / deltaT)``.
"""

from __future__ import annotations

import numpy as np


def integer_time_indices(max_time: int, delta_t: float) -> np.ndarray:
    """Solver-grid indices of the integer times 0..max_time-1."""
    return np.array([int(i / delta_t) for i in range(max_time)], dtype=np.int32)


def resample_integer_times(traj, max_time: int, delta_t: float):
    """Gather trajectory values (leading time axis) at integer times."""
    idx = integer_time_indices(max_time, delta_t)
    return traj[idx]


def resample_expected_counts(traj, max_time: int, delta_t: float):
    """Expected COUNT trajectory at integer times: sum over the node axis.

    The ``count=True`` mode of the reference resamplers (``ode_nn.py:237-241``,
    used for aggregate infected-count curves)."""
    return resample_integer_times(traj, max_time, delta_t).sum(axis=1)
