"""Graph ingestion and batching (data layer).

Replaces the reference's L0 layer (``create_graph`` at ``ode_nn.py:394-414``,
``create_graphs`` at ``ode_nn_ngraphs.py:154-165``) with immutable,
static-shape graph containers designed for XLA: sorted COO edge lists for
segment-sum SpMM, optional dense adjacency for the MXU path, and padded
multi-graph batching with precomputed offsets (no per-step host work).
"""

from gn_ode_sir_tpu.graphs.graph import Graph, graph_from_networkx, graph_from_edges
from gn_ode_sir_tpu.graphs.load import load_graph, load_graphs, GRAPH_STEM
from gn_ode_sir_tpu.graphs.batch import GraphBatch, pad_graphs, batch_index_graphs

__all__ = [
    "Graph",
    "GraphBatch",
    "GRAPH_STEM",
    "graph_from_networkx",
    "graph_from_edges",
    "load_graph",
    "load_graphs",
    "pad_graphs",
    "batch_index_graphs",
]
