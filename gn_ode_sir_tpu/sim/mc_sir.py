"""Vectorized Monte-Carlo SIR simulator (the throughput-critical entry point).

Stochastic process (identical in distribution to the reference's
``sir_torch``, ``ode_nn.py:46-82``): at each step, every infected node
independently tries to infect each susceptible neighbor with probability
beta (one Bernoulli coin per directed contact), and every node infected at
the start of the step recovers with probability gamma; recoveries and
infections both read start-of-step state.

TPU-native formulation: instead of drawing one coin per infected->susceptible
contact (data-dependent shapes, ``ode_nn.py:61-65``), we use the exact
per-node law: a susceptible node with k infected neighbors gets infected with
probability 1 - (1-beta)^k. That needs only the infected-neighbor COUNT
(one MXU matmul: I @ A, with A bf16 {0,1} — exact, counts are small
integers accumulated in f32) plus one uniform draw per node. All ``sims``
trajectories advance together as a [sims, n] matrix in a single
``lax.scan``; per-sim state indicators are summed on the fly so memory stays
[sims, n] regardless of T.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.graphs.graph import Graph


@partial(jax.jit, static_argnames=("sims", "max_time"))
def _simulate_chunk(a_bf16, seeds_mask, beta, gamma, key, *, sims: int, max_time: int):
    """Run ``sims`` trajectories; return per-step indicator SUMS [T, 3, n] f32.

    Sums of 0/1 indicators are integers, exact in f32 up to 2^24.
    """
    n = seeds_mask.shape[0]
    i0 = jnp.broadcast_to(seeds_mask, (sims, n)).astype(jnp.float32)
    s0 = 1.0 - i0
    r0 = jnp.zeros_like(i0)

    log1m_beta = jnp.log1p(-beta)

    def step(carry, t):
        s, i, r = carry
        k = jax.random.fold_in(key, t)
        ku, kv = jax.random.split(k)
        # infected-neighbor counts via MXU matmul (A symmetric, {0,1})
        counts = jnp.dot(
            i.astype(jnp.bfloat16), a_bf16, preferred_element_type=jnp.float32
        )
        p_inf = -jnp.expm1(counts * log1m_beta)  # 1 - (1-beta)^k, stable
        u = jax.random.uniform(ku, (sims, n))
        v = jax.random.uniform(kv, (sims, n))
        new_inf = s * (u < p_inf)
        new_rec = i * (v < gamma)
        s = s - new_inf
        i = i + new_inf - new_rec
        r = r + new_rec
        sums = jnp.stack([s.sum(0), i.sum(0), r.sum(0)])
        return (s, i, r), sums

    _, sums = jax.lax.scan(step, (s0, i0, r0), jnp.arange(1, max_time))
    sums0 = jnp.stack([s0.sum(0), i0.sum(0), r0.sum(0)])[None]
    return jnp.concatenate([sums0, sums], axis=0)  # [T, 3, n]


def simulate_sir_counts(
    graph: Graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    sims: int = 10000,
    max_time: int = 20,
    key=None,
    sims_chunk: int | None = None,
):
    """Indicator-count sums [max_time, 3, n] over ``sims`` trajectories.

    ``sims_chunk`` bounds the [sims, n] working set for very large graphs
    (HBM control); chunks run sequentially, each fully vectorized.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    a = jnp.asarray(graph.dense_adjacency, jnp.bfloat16)
    seeds_mask = jnp.zeros(graph.n_nodes, jnp.float32)
    seeds_mask = seeds_mask.at[jnp.asarray(np.asarray(seed_nodes))].set(1.0)

    if sims_chunk is None or sims_chunk >= sims:
        return _simulate_chunk(
            a, seeds_mask, float(beta), float(gamma), key, sims=sims, max_time=max_time
        )

    total = None
    done = 0
    chunk_id = 0
    while done < sims:
        c = min(sims_chunk, sims - done)
        sums = _simulate_chunk(
            a,
            seeds_mask,
            float(beta),
            float(gamma),
            jax.random.fold_in(key, 1000 + chunk_id),
            sims=c,
            max_time=max_time,
        )
        total = sums if total is None else total + sums
        done += c
        chunk_id += 1
    return total


def simulate_sir(
    graph: Graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    sims: int = 10000,
    max_time: int = 20,
    key=None,
    sims_chunk: int | None = None,
):
    """Per-node S/I/R probabilities, each [max_time, n] (the label triple).

    Drop-in TPU replacement for ``load_SIR_labels``'s extractor call
    (``ode_nn_ngraph_sim.py:198-199``: ``sir_torch(...)[0] / sim``).
    """
    sums = simulate_sir_counts(
        graph,
        seed_nodes,
        beta,
        gamma,
        sims=sims,
        max_time=max_time,
        key=key,
        sims_chunk=sims_chunk,
    )
    probs = np.asarray(sums, dtype=np.float64) / float(sims)
    return probs[:, 0, :], probs[:, 1, :], probs[:, 2, :]
