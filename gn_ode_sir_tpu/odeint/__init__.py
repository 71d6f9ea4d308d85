"""ODE solver layer — TPU-native replacement for ``torchdiffeq.odeint_adjoint``.

Fixed-step explicit solvers (euler / midpoint / rk4 / dopri5 fixed-grid) built
on ``lax.scan`` over a static time grid, mirroring the integration modes the
reference uses (``method='euler'`` at ``ode_nn_ngraph_sim.py:168``,
``method='rk4'`` at ``ode_nn.py:341``), with three gradient strategies:

- ``'checkpoint'`` (default): autodiff through the scan with a rematerialized
  step function — exact gradients, O(T) memory in the small carried state.
- ``'direct'``: plain autodiff, O(T) stored intermediates.
- ``'backsolve'``: continuous adjoint that re-integrates the state backwards
  in time (O(1) memory), the semantics of ``odeint_adjoint``.

Plus ``resample_integer_times``, the static-gather replacement for the
reference's per-step Python loop ``get_sir_t_nodes_torch`` (``ode_nn.py:249-261``).
"""

from gn_ode_sir_tpu.odeint.solvers import METHODS, odeint_grid, step_fn
from gn_ode_sir_tpu.odeint.adjoint import odeint_grid_backsolve
from gn_ode_sir_tpu.odeint.dopri import odeint_grid_adaptive
from gn_ode_sir_tpu.odeint.resample import (
    integer_time_indices,
    resample_expected_counts,
    resample_integer_times,
)

__all__ = [
    "METHODS",
    "odeint_grid",
    "odeint_grid_adaptive",
    "odeint_grid_backsolve",
    "step_fn",
    "integer_time_indices",
    "resample_integer_times",
    "resample_expected_counts",
]
