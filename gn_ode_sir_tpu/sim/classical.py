"""Classical mean-field SIR baseline (C4).

Re-implements the reference's scipy-integrated adjacency SIR field
(``ode_nn.py:214-233``): dS = -beta (A I) . S, dI = -dS - gamma I,
dR = gamma I — integrated on device with fixed-grid explicit solvers
(rk4 by default, matching the function's name in the reference even though
scipy's ``odeint`` is LSODA; an optional scipy engine is kept for exactness
comparisons in tests).

Stability: the reference's adaptive LSODA silently handles stiff
high-degree graphs; a fixed rk4 at h=0.5 diverges on enron
(beta * max_degree ~ 680 >> the ~2.8 explicit real-axis bound). The jax
path auto-refines the grid with power-of-two substeps chosen from the
diagonal-rate bound (see :func:`auto_substeps`), and a nested scan
materializes ONLY coarse-grid states (the dense fine trajectory on enron
would be ~4 GB of HBM).

TPU formulation: the baseline's message width is 1, which gather-based
sparse backends serve poorly (XLA compiles pathological layouts for
trailing dims of 1 at scale), so ALL trials of a batch integrate together
as a [B, n] state matrix against the dense {0,1} adjacency — one MXU
matmul per derivative evaluation amortizes the adjacency read over the
batch. f32 up to ~38k nodes — every shipped graph, including enron at
33,696 nodes (4.5 GB dense), stays on the f32 path; beyond the threshold
the adjacency drops to bf16 (exact for {0,1} entries, halving HBM). No
shipped dataset crosses the threshold, so the bf16 branch is covered by
unit test only (``tests/test_sim.py::test_classical_bf16_branch``), not by
a trigger-scale run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.odeint import resample_integer_times
from gn_ode_sir_tpu.odeint.solvers import step_fn

# beyond this node count the dense f32 adjacency exceeds ~6 GB; use bf16
_BF16_NODE_THRESHOLD = 38_000


def sir_field(t, y, args):
    """y = (S, I, R) each [n]; args = (a_dense, beta, gamma)."""
    a, beta, gamma = args
    s, i, r = y
    ai = a @ i
    ds = -beta * ai * s
    di = -ds - gamma * i
    dr = gamma * i
    return (ds, di, dr)


def sir_field_batch(t, y, args):
    """Batched field: y = (S, I, R) each [B, n]; beta/gamma [B, 1].

    The neighbor sum is one MXU matmul ``I @ A`` (A symmetric {0,1});
    casting I to A's dtype with f32 accumulation keeps the bf16 path's
    products exact in the adjacency and ~1e-3-relative in I."""
    a, beta, gamma = args
    s, i, r = y
    ai = jnp.matmul(i.astype(a.dtype), a, preferred_element_type=jnp.float32)
    ds = -beta * ai * s
    dr = gamma * i
    return (ds, -ds - dr, dr)


@partial(jax.jit, static_argnames=("method", "substeps", "delta_t"))
def _advance_chunk(y0, a, beta, gamma, ks, *, method, substeps, delta_t):
    """Advance ``len(ks)`` coarse intervals (``substeps`` internal steps
    each), returning the carry and the coarse-grid states."""
    step = step_fn(method)
    h = delta_t / substeps
    args = (a, beta, gamma)

    def advance(y, k):
        t0 = k.astype(jnp.float32) * delta_t

        def body(j, yj):
            return step(sir_field_batch, t0 + j * h, yj, h, args)

        y = jax.lax.fori_loop(0, substeps, body, y)
        return y, y

    return jax.lax.scan(advance, y0, ks)


# stiff runs split into multiple program dispatches: one device program
# running several minutes gets killed as "TPU worker crashed/restarted" by
# the remote-TPU transport (measured: <=55 s executions survive, a 220 s
# substeps=256 enron solve does not); ~2048 substage-intervals per dispatch
# keeps each program well under that.
_MAX_INTERVALS_PER_DISPATCH = 2048


def _integrate_coarse_batch(y0, a, beta, gamma, *, method, substeps, n_coarse,
                            delta_t):
    # one program SHAPE serves every dispatch: the tail chunk is padded to
    # the full chunk length (surplus states discarded) so stiff multi-chunk
    # runs don't pay a second remote-TPU compile (15-300 s through the
    # tunnel) for an odd-length final program
    chunk = min(max(1, _MAX_INTERVALS_PER_DISPATCH // substeps), n_coarse - 1)
    states = [tuple(y[None] for y in y0)]
    y = y0
    k0 = 0
    while k0 < n_coarse - 1:
        m = min(chunk, n_coarse - 1 - k0)
        ks = jnp.arange(k0, k0 + chunk)  # surplus intervals integrate past
        # the horizon (same field, finite states) and are sliced away below
        y, tail = _advance_chunk(
            y, a, beta, gamma, ks,
            method=method, substeps=substeps, delta_t=delta_t,
        )
        states.append(tuple(s[:m] for s in tail))
        k0 += m
    return tuple(
        jnp.concatenate([s[c] for s in states], axis=0) for c in range(len(y0))
    )


def auto_substeps(graph, betas, gamma_max: float, delta_t: float) -> int:
    """Smallest power-of-two refinement keeping every trial's
    ``h * (beta * max_degree + gamma)`` inside rk4's ~2.78 real-axis
    stability extent (with margin: <= 2.5).

    max_degree — not the adjacency's spectral radius — is the binding rate:
    the stiff term is the DIAGONAL per-node decay ``dS_v = -beta (A I)_v
    S_v`` whose coefficient reaches ``beta * deg_v`` when a hub's
    neighborhood is fully infected. Measured on enron (beta 0.49,
    max_deg 1383 -> 256 substeps): the spectral-radius bound (~118) allows
    16 substeps and every test trial diverges to NaN; 64 still loses 5/12;
    256 is clean."""
    rate = float(np.max(betas)) * float(graph.degrees.max()) + float(gamma_max)
    need = delta_t * rate / 2.5
    return 1 << int(np.ceil(np.log2(need))) if need > 1.0 else 1


def sir_classical_batch(
    graph,
    seed_sets,
    betas,
    gammas,
    *,
    delta_t: float = 0.5,
    max_time: int = 20,
    method: str = "rk4",
    substeps: int | None = None,
):
    """Mean-field trajectories for B trials at once: (I, S, R) each
    [B, max_time, n]. One compiled program; the dense adjacency read is
    amortized over the batch (12 enron test trials integrate together)."""
    n = graph.n_nodes
    b = len(seed_sets)
    i0 = np.zeros((b, n), np.float32)
    for k, seeds in enumerate(seed_sets):
        i0[k, np.asarray(seeds)] = 1.0
    betas = np.asarray(betas, np.float32).reshape(b, 1)
    gammas = np.asarray(gammas, np.float32).reshape(b, 1)
    if substeps is None:
        substeps = auto_substeps(graph, betas, float(gammas.max()), delta_t)
    dtype = jnp.float32 if n <= _BF16_NODE_THRESHOLD else jnp.bfloat16
    a = jnp.asarray(graph.dense_adjacency, dtype)
    y0 = (jnp.asarray(1.0 - i0), jnp.asarray(i0), jnp.zeros((b, n), jnp.float32))
    traj = _integrate_coarse_batch(
        y0, a, jnp.asarray(betas), jnp.asarray(gammas),
        method=method, substeps=int(substeps),
        n_coarse=int(round(max_time / delta_t)), delta_t=float(delta_t),
    )
    s_t, i_t, r_t = (np.asarray(x) for x in traj)  # [n_coarse, B, n]
    i_s = resample_integer_times(i_t, max_time, delta_t).transpose(1, 0, 2)
    s_s = resample_integer_times(s_t, max_time, delta_t).transpose(1, 0, 2)
    r_s = resample_integer_times(r_t, max_time, delta_t).transpose(1, 0, 2)
    return i_s, s_s, r_s


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
    (``runge_kutta_order4``, ``ode_nn.py:233``). ``substeps=None``
    auto-selects the stability refinement (see module docstring).
    """
    n = graph.n_nodes

    if engine == "scipy":
        from scipy.integrate import odeint as odeintscp
        from scipy.sparse import coo_matrix

        i0 = np.zeros(n)
        i0[np.asarray(seed_nodes)] = 1.0
        s0 = 1.0 - i0
        r0 = np.zeros(n)

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
        i_s = resample_integer_times(i_t, max_time, delta_t)
        s_s = resample_integer_times(s_t, max_time, delta_t)
        r_s = resample_integer_times(r_t, max_time, delta_t)
        return i_s, s_s, r_s

    i_b, s_b, r_b = sir_classical_batch(
        graph, [seed_nodes], [beta], [gamma],
        delta_t=delta_t, max_time=max_time, method=method, substeps=substeps,
    )
    return i_b[0], s_b[0], r_b[0]
