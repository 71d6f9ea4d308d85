"""Classical mean-field SIR baseline (C4).

Re-implements the reference's scipy-integrated adjacency SIR field
(``ode_nn.py:214-233``): dS = -beta (A I) . S, dI = -dS - gamma I,
dR = gamma I — here integrated on device with the shared fixed-grid solvers
(rk4 by default, matching the function's name in the reference even though
scipy's ``odeint`` is LSODA; an optional scipy engine is kept for exactness
comparisons in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.odeint import resample_integer_times
from gn_ode_sir_tpu.odeint.solvers import step_fn


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


@partial(jax.jit, static_argnames=("method", "substeps", "n_coarse", "delta_t"))
def _integrate_coarse(y0, args, *, method, substeps, n_coarse, delta_t):
    """Integrate the mean-field on the ``delta_t`` grid, taking ``substeps``
    internal explicit steps per grid interval but materializing ONLY the
    coarse-grid states — the fine trajectory on enron (substeps=256:
    10,240 x 33,696 x 3 f32) would be ~4 GB of HBM and crashed the TPU
    worker when saved densely."""
    step = step_fn(method)
    h = delta_t / substeps

    def advance(y, k):
        t0 = k.astype(jnp.float32) * delta_t

        def body(j, yj):
            return step(sir_field_adj, t0 + j * h, yj, h, args)

        y = jax.lax.fori_loop(0, substeps, body, y)
        return y, y

    _, tail = jax.lax.scan(advance, y0, jnp.arange(n_coarse - 1))
    return tuple(
        jnp.concatenate([y[None], t], axis=0) for y, t in zip(y0, tail)
    )


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
    substeps: int | None = None,
):
    """Mean-field S/I/R trajectories at integer times, each [max_time, n].

    Returns (I, S, R) — the reference's return order
    (``runge_kutta_order4``, ``ode_nn.py:233``).

    ``substeps`` refines the fixed ``delta_t`` grid for the explicit jax
    solvers. The reference integrates with scipy's adaptive LSODA
    (``ode_nn.py:227``), which silently handles stiff high-degree graphs; a
    fixed rk4 at h=0.5 diverges on enron (beta * max_degree ~ 350 >> the
    ~2.8 real-axis stability bound). ``None`` auto-picks the smallest
    power-of-two refinement that puts ``h * (beta * max_degree + gamma)``
    inside the stability region, so the per-trial loop compiles only
    O(log) distinct grid lengths.
    """
    n = graph.n_nodes
    i0 = np.zeros(n)
    i0[np.asarray(seed_nodes)] = 1.0
    s0 = 1.0 - i0
    r0 = np.zeros(n)

    if engine == "scipy":
        from scipy.integrate import odeint as odeintscp
        from scipy.sparse import coo_matrix

        # CSR matvec, not dense: enron's dense f64 adjacency is 9 GB
        a_sp = coo_matrix(
            (np.ones(graph.n_edges), (graph.dst, graph.src)), shape=(n, n)
        ).tocsr()

        def field(x, t):
            s, i, r = x[:n], x[n : 2 * n], x[2 * n :]
            ai = a_sp @ i
            ds = -beta * ai * s
            di = -ds - gamma * i
            return np.hstack([ds, di, gamma * i])

        ts = np.arange(0, max_time, delta_t)
        sol = odeintscp(field, np.hstack([s0, i0, r0]), ts)
        s_t, i_t, r_t = sol[:, :n], sol[:, n : 2 * n], sol[:, 2 * n :]
    else:
        from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph

        if substeps is None:
            rate = float(beta) * float(graph.degrees.max()) + float(gamma)
            need = delta_t * rate / 2.5
            substeps = 1 << int(np.ceil(np.log2(need))) if need > 1.0 else 1
        n_coarse = int(round(max_time / delta_t))
        # dense MXU for small graphs, bucketed ELL at scale: the baseline's
        # message width is 1, which the pallas2 kernel's VMEM tiling cannot
        # serve efficiently, and enron's dense adjacency would be 4.5 GB
        from gn_ode_sir_tpu.ops.spmm import DENSE_NODE_THRESHOLD

        kind = "dense" if graph.n_nodes <= DENSE_NODE_THRESHOLD else "ell"
        adj = adjacency_from_graph(graph, kind=kind)
        traj = _integrate_coarse(
            (jnp.asarray(s0, jnp.float32), jnp.asarray(i0, jnp.float32),
             jnp.asarray(r0, jnp.float32)),
            (adj, float(beta), float(gamma)),
            method=method, substeps=substeps, n_coarse=n_coarse,
            delta_t=float(delta_t),
        )
        s_t, i_t, r_t = (np.asarray(x) for x in traj)

    i_s = resample_integer_times(i_t, max_time, delta_t)
    s_s = resample_integer_times(s_t, max_time, delta_t)
    r_s = resample_integer_times(r_t, max_time, delta_t)
    return i_s, s_s, r_s
