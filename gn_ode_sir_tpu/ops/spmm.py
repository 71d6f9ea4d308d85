"""Sparse matrix-matrix multiply (the framework's hottest primitive).

Every model family routes its message passing through here: the GN-ODE
function's A·I term (reference ``ode_nn_ngraph_sim.py:73``), GCN/GIN
convolutions (reference PyG ``GCNConv``/``GINConv``), the Monte-Carlo
simulator's infected-neighbor counts, and the classical mean-field baseline.

Two execution strategies, chosen by graph size:

- **dense (MXU)**: for graphs up to ``DENSE_NODE_THRESHOLD`` nodes the {0,1}
  adjacency is materialized once and SpMM becomes a plain matmul on the
  128x128 systolic array — far faster than gather/scatter for the dense-ish
  mid-size graphs in this workload (karate..wiki-vote).
- **COO gather + segment-sum**: for large graphs (enron: 361k directed
  edges), rows are gathered by ``src`` and segment-summed into ``dst``
  (sorted). The chunked Pallas kernel for this path (the measured-fastest
  large-graph backend on TPU) lives in ``pallas_spmm2.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gn_ode_sir_tpu.ops.segment import segment_sum

# Above this node count a dense n*n f32 adjacency (> ~256 MB) stops paying
# for itself against HBM capacity; fall back to the COO path.
DENSE_NODE_THRESHOLD = 8192


def spmm_dense(a_dense, x):
    """out[..., i, h] = sum_j A[i, j] * x[..., j, h] on the MXU."""
    return jnp.einsum(
        "ij,...jh->...ih", a_dense, x, preferred_element_type=jnp.float32
    )


def spmm_coo(src, dst, x, n_nodes: int, edge_w=None):
    """COO SpMM for one graph: gather rows by src, segment-sum into dst.

    Args:
      src, dst: int32 [E] (dst sorted ascending; padding allowed via edge_w=0).
      x: [n_nodes, h].
      edge_w: optional float [E] edge weights (also used to mask padding).
    Returns [n_nodes, h].
    """
    msgs = x[src]
    if edge_w is not None:
        msgs = msgs * edge_w[:, None]
    return segment_sum(msgs, dst, n_nodes, indices_are_sorted=True)


def spmm_coo_batched(src, dst, x, n_nodes: int, edge_w=None):
    """Batched COO SpMM with shared edges: x is [B, n_nodes, h].

    The shared-graph trial batch (reference builds a block-diagonal adjacency
    of B copies for this, ``ode_nn_ngraph_sim.py:68-70``) is just a batch
    axis here — no block-diagonal materialization, ever.
    """
    msgs = x[:, src, :]
    if edge_w is not None:
        msgs = msgs * edge_w[None, :, None]
    return jax.vmap(
        lambda m: segment_sum(m, dst, n_nodes, indices_are_sorted=True)
    )(msgs)


def spmm(graph, x, edge_w=None, *, prefer_dense: bool | None = None):
    """Dispatching SpMM over a host-side :class:`~gn_ode_sir_tpu.graphs.Graph`.

    ``x`` may be [n, h] or [B, n, h]. Dense path is chosen for graphs under
    ``DENSE_NODE_THRESHOLD`` nodes unless overridden.
    """
    if prefer_dense is None:
        prefer_dense = graph.n_nodes <= DENSE_NODE_THRESHOLD
    if prefer_dense and edge_w is None:
        return spmm_dense(jnp.asarray(graph.dense_adjacency), x)
    src = jnp.asarray(graph.src)
    dst = jnp.asarray(graph.dst)
    if x.ndim == 2:
        return spmm_coo(src, dst, x, graph.n_nodes, edge_w)
    return spmm_coo_batched(src, dst, x, graph.n_nodes, edge_w)


def gcn_norm_edges(graph, add_self_loops: bool = True):
    """Symmetric GCN normalization: D^-1/2 (A + I) D^-1/2.

    Matches PyG ``GCNConv``'s default normalization used by the reference
    GCN baseline (``gnn_ngraph.py:36-40``). Computed host-side once; returns
    (src, dst, weight) numpy arrays with self-loop edges appended.
    """
    import numpy as np

    src, dst = graph.src, graph.dst
    if add_self_loops:
        # PyG add_remaining_self_loops semantics: drop any self-loop the
        # graph already carries, then append exactly one per node — else a
        # loaded loop edge is double-counted on the segment-sum path while
        # the dense path's a[dst, src] = w write keeps a single copy, and
        # the two backends train on different normalized matrices
        keep = src != dst
        src, dst = src[keep], dst[keep]
        loops = np.arange(graph.n_nodes, dtype=np.int32)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])
    deg = np.bincount(dst, minlength=graph.n_nodes).astype(np.float32)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    w = dinv[src] * dinv[dst]
    order = np.lexsort((src, dst))
    return src[order], dst[order], w[order].astype(np.float32)
