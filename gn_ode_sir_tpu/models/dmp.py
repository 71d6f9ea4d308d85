"""DMP — Dynamic Message Passing analytic SIR baseline.

Re-implements the reference's cavity-method edge-message recursion
(``dmp.py:36-170``) on XLA segment ops: the torch_scatter
``scatter(reduce='mul')`` aggregations (``dmp.py:91-93,121,139``) become
``segment_prod``, and the whole time recursion is one ``lax.scan`` — no
Python-level iteration, fully jittable and batchable over trials.

Message updates (per directed edge i->j, weight w = beta):
  theta_ij(t) = theta_ij(t-1) - w * phi_ij(t-1)
  Ps_ij(t)    = Ps_i(0) * prod_{k in N(i) \\ j} theta_ki(t)
  phi_ij(t)   = (1-w)(1-gamma_i) phi_ij(t-1) - (Ps_ij(t) - Ps_ij(t-1))
Marginals:
  Ps_i(t) = Ps_i(0) * prod_{k in N(i)} theta_ki(t)
  Pr_i(t) = Pr_i(t-1) + gamma_i * Pi_i(t-1)
  Pi_i(t) = 1 - Ps_i(t) - Pr_i(t)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.ops.segment import segment_prod


def cave_index(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Index of each directed edge's reverse edge; E (sentinel) if absent.

    Vectorized equivalent of the reference's networkx edge-attribute walk
    (``dmp.py:36-50``).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    E = src.shape[0]
    n = int(max(src.max(initial=0), dst.max(initial=0))) + 1 if E else 1

    from gn_ode_sir_tpu import native

    out = native.reverse_edge_index(src, dst, n)
    if out is not None:
        return out

    code = src * n + dst
    rev_code = dst * n + src
    order = np.argsort(code)
    pos = np.searchsorted(code[order], rev_code)
    pos = np.clip(pos, 0, E - 1)
    found = code[order][pos] == rev_code
    cave = np.where(found, order[pos], E)
    return cave.astype(np.int32)


@partial(jax.jit, static_argnames=("n_nodes", "max_time"))
def _dmp_run(src, dst, cave, w, gamma, seeds, *, n_nodes: int, max_time: int):
    if max_time < 1:
        raise ValueError(f"max_time must be >= 1, got {max_time}")
    E = src.shape[0]
    gamma_src = gamma[src]

    def mulmul(theta):
        # prod over incoming edges at each node / cavity (reverse-edge) term
        theta_node = segment_prod(theta, dst, n_nodes, indices_are_sorted=True)
        theta_cav = segment_prod(theta, cave, E + 1, indices_are_sorted=False)[:E]
        return theta_node[src] / theta_cav

    ps0 = 1.0 - seeds
    pi0 = seeds
    pr0 = jnp.zeros_like(seeds)
    if max_time == 1:  # t=0 only (short-horizon guard: the scan below has
        return jnp.stack([ps0, pi0, pr0], axis=-1)[None]  # length T-2)
    ps_i0 = ps0[src]
    phi0 = 1.0 - ps_i0
    theta0 = jnp.ones(E, dtype=w.dtype)

    # t = 1 (reference _set_seeds, dmp.py:114-125)
    theta = theta0 - w * phi0 + 1e-10
    ps_ij_prev = ps_i0
    ps_ij = ps_i0 * mulmul(theta)
    phi = (1.0 - w) * (1.0 - gamma_src) * phi0 - (ps_ij - ps_ij_prev)

    ps1 = ps0 * segment_prod(theta, dst, n_nodes, indices_are_sorted=True)
    pr1 = pr0 + gamma * pi0
    pi1 = 1.0 - ps1 - pr1

    def body(carry, _):
        theta, phi, ps_ij, pr, pi = carry
        theta = theta - w * phi
        new_ps_ij = ps_i0 * mulmul(theta)
        phi = (1.0 - w) * (1.0 - gamma_src) * phi - (new_ps_ij - ps_ij)
        ps_t = ps0 * segment_prod(theta, dst, n_nodes, indices_are_sorted=True)
        pr_t = pr + gamma * pi
        pi_t = 1.0 - ps_t - pr_t
        out = jnp.stack([ps_t, pi_t, pr_t], axis=-1)
        return (theta, phi, new_ps_ij, pr_t, pi_t), out

    m0 = jnp.stack([ps0, pi0, pr0], axis=-1)
    m1 = jnp.stack([ps1, pi1, pr1], axis=-1)
    if max_time == 2:
        return jnp.stack([m0, m1], axis=0)

    carry0 = (theta, phi, ps_ij, pr1, pi1)
    _, rest = jax.lax.scan(body, carry0, None, length=max_time - 2)
    return jnp.concatenate([m0[None], m1[None], rest], axis=0)  # [T, N, 3]


@partial(jax.jit, static_argnames=("n_nodes", "max_time"))
def _dmp_run_many(src, dst, cave, w, gamma, seeds, *, n_nodes: int,
                  max_time: int):
    """vmapped trial batch: w/gamma/seeds carry a leading [B] axis; the edge
    structure (src/dst/cave) is shared — one compiled program, one dispatch
    for the whole test split."""
    run = partial(_dmp_run, n_nodes=n_nodes, max_time=max_time)
    return jax.vmap(run, in_axes=(None, None, None, 0, 0, 0))(
        src, dst, cave, w, gamma, seeds)


@dataclasses.dataclass(frozen=True)
class DMPSIR:
    """Closed-form DMP inference on one graph.

    Construct once per graph (edge structure is host-precomputed), then call
    :meth:`run` per trial — beta/gamma/seeds are runtime inputs, so one jit
    compilation serves every trial on the graph (the reference rebuilds the
    whole edge list per trial, ``dmp.py:349``).
    """

    src: np.ndarray
    dst: np.ndarray
    cave: np.ndarray
    n_nodes: int

    @classmethod
    def from_graph(cls, graph) -> "DMPSIR":
        return cls(
            src=np.asarray(graph.src),
            dst=np.asarray(graph.dst),
            cave=cave_index(graph.src, graph.dst),
            n_nodes=graph.n_nodes,
        )

    def run(self, seed_nodes, beta, gamma, max_time: int = 20):
        """Marginals [max_time, n_nodes, 3] (S, I, R), starting at t=0.

        ``beta`` is a scalar transmission probability or a per-edge weight
        array [E] (aligned with ``src``/``dst``); ``gamma`` is a scalar
        recovery probability or a per-node array [n_nodes] — full parity
        with the reference's heterogeneous ``DMP_SIR(weight_adj,
        nodes_gamma)`` surface (``dmp.py:163-170``). The recursion itself is
        already heterogeneous; this only widens the public conversion.
        """
        seeds = jnp.zeros(self.n_nodes, jnp.float32).at[jnp.asarray(seed_nodes)].set(1.0)
        E = self.src.shape[0]
        beta = jnp.asarray(beta, jnp.float32)
        gamma = jnp.asarray(gamma, jnp.float32)
        w = jnp.broadcast_to(beta, (E,))
        g = jnp.broadcast_to(gamma, (self.n_nodes,))
        return _dmp_run(
            jnp.asarray(self.src),
            jnp.asarray(self.dst),
            jnp.asarray(self.cave),
            w,
            g,
            seeds,
            n_nodes=self.n_nodes,
            max_time=max_time,
        )

    def run_many(self, seed_sets, betas, gammas, max_time: int = 20):
        """Marginals [B, max_time, n_nodes, 3] for B trials in ONE program.

        The reference (and :meth:`run`) dispatches one inference per trial
        (``dmp.py:347-350`` loops the test split); here the whole split
        rides one vmapped scan — the DMP analogue of the batched MC
        extraction (``simulate_sir_many``). ``betas`` is [B] scalars or
        [B, E] per-edge weights; ``gammas`` is [B] scalars or [B, n] per
        node.
        """
        B = len(seed_sets)
        E = self.src.shape[0]
        seeds = np.zeros((B, self.n_nodes), np.float32)
        for k, s in enumerate(seed_sets):
            seeds[k, np.asarray(list(s), dtype=np.int64)] = 1.0
        w = np.broadcast_to(
            np.asarray(betas, np.float32).reshape(B, -1), (B, E))
        g = np.broadcast_to(
            np.asarray(gammas, np.float32).reshape(B, -1), (B, self.n_nodes))
        return _dmp_run_many(
            jnp.asarray(self.src),
            jnp.asarray(self.dst),
            jnp.asarray(self.cave),
            jnp.asarray(w),
            jnp.asarray(g),
            jnp.asarray(seeds),
            n_nodes=self.n_nodes,
            max_time=max_time,
        )
