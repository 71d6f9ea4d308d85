"""Label extraction: Monte-Carlo SIR simulation + classical mean-field baseline.

Replaces the reference's three Python-loop simulators (``sir_torch``
``ode_nn.py:30-88``, ``sir_pandas`` ``:90-157``, ``sir_nx`` ``:159-211``)
with ONE vectorized simulator: all simulations advance together as a
[sims, n] state matrix inside a ``lax.scan`` over time — no Python-level
sims x T loop of tiny kernels, no per-step host sync.
"""

from gn_ode_sir_tpu.sim.mc_sir import (
    simulate_sir,
    simulate_sir_counts,
    simulate_sir_counts_many,
    simulate_sir_many,
    simulate_sir_per_sim,
    sir_per_sim_stats,
)
from gn_ode_sir_tpu.sim.classical import sir_classical, sir_classical_batch, sir_field

__all__ = [
    "simulate_sir",
    "simulate_sir_counts",
    "simulate_sir_counts_many",
    "simulate_sir_many",
    "simulate_sir_per_sim",
    "sir_per_sim_stats",
    "sir_classical",
    "sir_field",
    "sir_classical_batch",
]
