"""Immutable static-shape graph container.

The reference keeps graphs as scipy CSR matrices and rebuilds a block-diagonal
COO on the host inside every ODE function evaluation
(``ode_nn_ngraph_sim.py:68-73``). Here a graph is preprocessed ONCE into
sorted COO arrays (plus an optional dense adjacency for the MXU matmul path)
and never touched again on the host during training.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


@dataclasses.dataclass(frozen=True)
class Graph:
    """A static undirected graph stored as a directed COO edge list.

    Attributes:
      n_nodes: number of nodes (ids are 0..n_nodes-1).
      src, dst: int32 arrays of length ``n_edges`` (directed; an undirected
        edge contributes both (u,v) and (v,u), mirroring the doubled edge
        list the reference builds at ``ode_nn.py:32-38``). Edges are sorted
        by ``dst`` so that segment-sum aggregation over destinations sees
        monotonically increasing segment ids.
      name: dataset stem (e.g. "karate"), used for label-cache keys.
    """

    n_nodes: int
    src: np.ndarray
    dst: np.ndarray
    name: str = "graph"

    def __post_init__(self):
        object.__setattr__(self, "src", np.asarray(self.src, dtype=np.int32))
        object.__setattr__(self, "dst", np.asarray(self.dst, dtype=np.int32))
        if self.src.shape != self.dst.shape or self.src.ndim != 1:
            raise ValueError("src/dst must be 1-D arrays of equal length")

    @property
    def n_edges(self) -> int:
        """Number of *directed* edges (2x the undirected edge count)."""
        return int(self.src.shape[0])

    @cached_property
    def degrees(self) -> np.ndarray:
        """In-degree per node (== out-degree for undirected graphs)."""
        return np.bincount(self.dst, minlength=self.n_nodes).astype(np.int32)

    @cached_property
    def dense_adjacency(self) -> np.ndarray:
        """Dense float32 {0,1} adjacency — the MXU SpMM path for small/mid graphs."""
        a = np.zeros((self.n_nodes, self.n_nodes), dtype=np.float32)
        a[self.dst, self.src] = 1.0
        return a

    def padded_edges(
        self, e_max: int, n_pad: int | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Edge arrays padded to a static length ``e_max``.

        Padding edges carry weight 0 so they contribute nothing to any
        weighted aggregation, and their ``dst`` is the LAST padded node index
        (``n_pad - 1``, >= every real dst) so the edge list STAYS dst-sorted:
        segment reductions downstream pass ``indices_are_sorted=True``, and
        violating that hint is undefined behavior in XLA's scatter lowering
        (the root cause of the round-1 intermittent TPU faults on the
        per-sample COO multigraph path at 7k-node padding).

        Returns (src, dst, weight) with shape [e_max] each.
        """
        e = self.n_edges
        if e_max < e:
            raise ValueError(f"e_max={e_max} < n_edges={e}")
        pad_dst = (n_pad if n_pad is not None else self.n_nodes) - 1
        src = np.zeros(e_max, dtype=np.int32)
        dst = np.full(e_max, pad_dst, dtype=np.int32)
        w = np.zeros(e_max, dtype=np.float32)
        src[:e], dst[:e], w[:e] = self.src, self.dst, 1.0
        return src, dst, w


def graph_from_edges(n_nodes: int, undirected_edges, name: str = "graph") -> Graph:
    """Build a :class:`Graph` from an iterable of undirected (u, v) pairs.

    Self-loops are kept as a single directed edge; duplicate undirected edges
    are deduplicated (networkx Graph semantics). Uses the native C++ core
    (:mod:`gn_ode_sir_tpu.native`) when available, numpy otherwise.
    """
    pairs = np.asarray(
        [(int(u), int(v)) for u, v in undirected_edges], dtype=np.int32
    ).reshape(-1, 2)
    # Bounds-check HERE, once, for both build paths: the native core's -1
    # error return maps to None, which used to be indistinguishable from
    # "library unavailable" — the unvalidated numpy fallback then mangled
    # out-of-range ids into structurally wrong edges (a -1 id floor-divides
    # to node pair (-1, 5), and dense_adjacency's fancy indexing silently
    # wraps -1 to the last node).
    if pairs.size and (pairs.min() < 0 or pairs.max() >= n_nodes):
        bad = pairs[(pairs < 0).any(1) | (pairs >= n_nodes).any(1)][0]
        raise ValueError(
            f"edge ({bad[0]}, {bad[1]}) has a node id outside "
            f"[0, {n_nodes}) — node ids must be 0..n_nodes-1"
        )

    from gn_ode_sir_tpu import native

    out = native.coalesce_undirected(pairs, n_nodes)
    if out is not None:
        src, dst = out
        return Graph(n_nodes=n_nodes, src=src, dst=dst, name=name)

    # numpy fallback: canonical-code dedup, symmetrize, (dst, src) sort
    n = int(n_nodes)
    a = np.minimum(pairs[:, 0], pairs[:, 1]).astype(np.int64)
    b = np.maximum(pairs[:, 0], pairs[:, 1]).astype(np.int64)
    codes = np.unique(a * n + b)
    ca, cb = codes // n, codes % n
    loops = ca == cb
    src = np.concatenate([ca, cb[~loops]])
    dst = np.concatenate([cb, ca[~loops]])
    order = np.lexsort((src, dst))  # sort by dst, then src
    return Graph(
        n_nodes=n_nodes,
        src=src[order].astype(np.int32),
        dst=dst[order].astype(np.int32),
        name=name,
    )


def graph_from_networkx(G, name: str = "graph") -> Graph:
    """Convert a networkx graph, relabelling nodes to 0..n-1.

    Node ids follow the iteration order of ``G.nodes()`` — the same order
    ``nx.adjacency_matrix`` uses in the reference (``ode_nn.py:413``), so
    matrix/seed indices agree with the reference's.

    Deviation note: the reference indexes state arrays by *raw node labels*
    inside ``sir_torch`` (``ode_nn.py:33-38``), which only works when labels
    happen to be contiguous 0..n-1 (true for the shipped pickles). We always
    relabel, which fixes that latent bug for arbitrary graphs.
    """
    nodes = list(G.nodes())
    index = {u: i for i, u in enumerate(nodes)}
    edges = ((index[u], index[v]) for u, v in G.edges())
    return graph_from_edges(len(nodes), edges, name=name)
