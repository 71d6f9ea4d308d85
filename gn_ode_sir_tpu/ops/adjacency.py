"""Adjacency pytrees — jit-transparent graph connectivity for model code.

Models never see scipy matrices or host objects: connectivity enters jitted
functions as one of these pytrees and message passing is ``adj.matvec(x)``
with ``x`` of shape [B, n, h].

- :class:`DenseAdj` — the MXU path (einsum with a materialized adjacency).
- :class:`CooAdj`   — gather + sorted segment-sum; supports shared edges
  ([E]) or per-sample padded edges ([B, E]) for heterogeneous multi-graph
  batches (replacing the reference's per-f-eval ``scipy.sparse.block_diag``
  at ``ode_nn_ngraphs.py:65-73``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gn_ode_sir_tpu.ops.segment import segment_sum


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseAdj:
    """Dense adjacency [n, n] (shared) or [B, n, n] (per-sample).

    Store ``a`` in bfloat16 (exact for a {0,1} adjacency) to halve the HBM
    traffic of the matmul — activations are cast to match and the MXU
    accumulates in f32 (``adjacency_from_graph(..., dtype=jnp.bfloat16)``).
    """

    a: jnp.ndarray

    def matvec(self, x):
        xm = x.astype(self.a.dtype) if self.a.dtype == jnp.bfloat16 else x
        if self.a.ndim == 2:
            return jnp.einsum("ij,bjh->bih", self.a, xm, preferred_element_type=jnp.float32)
        return jnp.einsum("bij,bjh->bih", self.a, xm, preferred_element_type=jnp.float32)

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CooAdj:
    """Sorted COO adjacency.

    ``src``/``dst`` are [E] (shared across the batch) or [B, E] (per-sample,
    padded; padding edges carry ``w == 0``). ``n_nodes`` is static.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    w: jnp.ndarray | None
    n_nodes: int

    def matvec(self, x):
        n = self.n_nodes
        if self.src.ndim == 1:
            msgs = x[:, self.src, :]
            if self.w is not None:
                msgs = msgs * self.w[None, :, None]
            return jax.vmap(lambda m: segment_sum(m, self.dst, n))(msgs)

        def one(src, dst, w, xb):
            msgs = xb[src]
            if w is not None:
                msgs = msgs * w[:, None]
            return segment_sum(msgs, dst, n)

        return jax.vmap(one)(self.src, self.dst, self.w, x)

    def tree_flatten(self):
        return (self.src, self.dst, self.w), self.n_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_nodes=aux)


def adjacency_from_graph(graph, *, prefer_dense: bool | None = None, dtype=None,
                         kind: str = "auto"):
    """Build the right adjacency pytree for a host-side Graph.

    ``kind``: 'auto' (dense MXU up to DENSE_NODE_THRESHOLD nodes; beyond
    that the chunked Pallas kernel on TPU, bucketed ELL elsewhere — the
    measured-fastest choice at each scale: enron h=64 per-apply 5.3 ms
    pallas2 vs 5.4 ELL vs 7.5 COO, TPU v5e), or an explicit
    'dense' | 'dense-bf16' | 'coo' | 'ell' | 'pallas2' | 'pallas2-bf16'.
    ``prefer_dense``
    is the legacy boolean override (True -> dense, False -> coo).
    ``dtype=jnp.bfloat16`` halves dense-path HBM traffic (exact {0,1}
    adjacency; activations round to bf16 inside the matmul).
    """
    from gn_ode_sir_tpu.ops.spmm import DENSE_NODE_THRESHOLD

    if prefer_dense is not None:
        kind = "dense" if prefer_dense else "coo"
    if kind == "auto":
        if graph.n_nodes <= DENSE_NODE_THRESHOLD:
            kind = "dense"
        else:
            # pallas2 only lowers on real TPU (the axon tunnel reports its
            # own platform name); interpret mode on CPU would crawl at this
            # scale, so the CPU backend keeps the ELL path
            kind = "ell" if jax.default_backend() == "cpu" else "pallas2"
    if kind == "dense-bf16":
        kind, dtype = "dense", jnp.bfloat16
    if kind == "dense":
        return DenseAdj(jnp.asarray(graph.dense_adjacency, dtype or jnp.float32))
    if kind == "ell":
        from gn_ode_sir_tpu.ops.ell import EllAdj

        return EllAdj.from_graph(graph)
    if kind == "coo":
        return CooAdj(
            jnp.asarray(graph.src), jnp.asarray(graph.dst), None, graph.n_nodes
        )
    if kind in ("pallas2", "pallas2-bf16"):
        from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2Adj

        # chunk geometry: k=2048 measured 13-15% faster per apply than the
        # round-2 k=1024 default on both wiki-vote (0.54 vs 0.62 ms) and
        # enron (1.79 vs 2.02 ms) — fewer sequential grid steps; r_rows
        # 256 vs 512 is within session noise (round-5 sweep,
        # runs_r5/probe_spmm_geometry.json)
        return Pallas2Adj.from_graph(
            graph, k_edges=2048, r_rows=256,
            precision="bf16" if kind.endswith("bf16") else "f32",
        )
    raise ValueError(f"unknown adjacency kind {kind!r}")


def adjacency_from_batch(batch, graph_idx):
    """Per-trial CooAdj rows for a padded multi-graph batch (gather only)."""
    import numpy as np

    gi = np.asarray(graph_idx)
    return CooAdj(
        jnp.asarray(batch.src[gi]),
        jnp.asarray(batch.dst[gi]),
        jnp.asarray(batch.edge_w[gi]),
        batch.n_max,
    )
