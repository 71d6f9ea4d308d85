"""Classical mean-field SIR baseline (C4).

Re-implements the reference's scipy-integrated adjacency SIR field
(``ode_nn.py:214-233``): dS = -beta (A I) . S, dI = -dS - gamma I,
dR = gamma I — here integrated on device with the shared fixed-grid solvers
(rk4 by default, matching the function's name in the reference even though
scipy's ``odeint`` is LSODA; an optional scipy engine is kept for exactness
comparisons in tests).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.odeint import odeint_grid, resample_integer_times


def sir_field(t, y, args):
    """y = (S, I, R) each [n]; args = (a_dense, beta, gamma)."""
    a, beta, gamma = args
    s, i, r = y
    ai = a @ i
    ds = -beta * ai * s
    di = -ds - gamma * i
    dr = gamma * i
    return (ds, di, dr)


def sir_field_adj(t, y, args):
    """Same field through an adjacency pytree's ``matvec`` — the sparse path
    for graphs whose dense adjacency would not fit (enron: 33,696^2 f32 is
    4.5 GB; the ELL/COO pytrees carry only the 361k directed edges)."""
    adj, beta, gamma = args
    s, i, r = y
    ai = adj.matvec(i[None, :, None])[0, :, 0]
    ds = -beta * ai * s
    di = -ds - gamma * i
    dr = gamma * i
    return (ds, di, dr)


def sir_classical(
    graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    delta_t: float = 0.5,
    max_time: int = 20,
    method: str = "rk4",
    engine: str = "jax",
):
    """Mean-field S/I/R trajectories at integer times, each [max_time, n].

    Returns (I, S, R) — the reference's return order
    (``runge_kutta_order4``, ``ode_nn.py:233``).
    """
    n = graph.n_nodes
    i0 = np.zeros(n)
    i0[np.asarray(seed_nodes)] = 1.0
    s0 = 1.0 - i0
    r0 = np.zeros(n)

    if engine == "scipy":
        from scipy.integrate import odeint as odeintscp

        def field(x, t):
            s, i, r = x[:n], x[n : 2 * n], x[2 * n :]
            ai = graph.dense_adjacency @ i
            ds = -beta * ai * s
            di = -ds - gamma * i
            return np.hstack([ds, di, gamma * i])

        ts = np.arange(0, max_time, delta_t)
        sol = odeintscp(field, np.hstack([s0, i0, r0]), ts)
        s_t, i_t, r_t = sol[:, :n], sol[:, n : 2 * n], sol[:, 2 * n :]
    else:
        from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph

        ts = jnp.arange(0.0, max_time, delta_t, dtype=jnp.float32)
        # auto backend: dense MXU for small graphs, bucketed ELL at scale
        # (keeps the enron baseline off the 4.5 GB dense adjacency)
        adj = adjacency_from_graph(graph)
        traj = odeint_grid(
            sir_field_adj,
            (jnp.asarray(s0, jnp.float32), jnp.asarray(i0, jnp.float32), jnp.asarray(r0, jnp.float32)),
            ts,
            (adj, float(beta), float(gamma)),
            method=method,
            adjoint="direct",
        )
        s_t, i_t, r_t = (np.asarray(x) for x in traj)

    i_s = resample_integer_times(i_t, max_time, delta_t)
    s_s = resample_integer_times(s_t, max_time, delta_t)
    r_s = resample_integer_times(r_t, max_time, delta_t)
    return i_s, s_s, r_s
