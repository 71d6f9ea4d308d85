"""Loaders for the networkx graph pickles shipped with the reference.

Mirrors ``create_graph`` (``ode_nn.py:394-414``) and ``create_graphs``
(``ode_nn_ngraphs.py:154-165``): unpickle, undirect, restrict to the largest
connected component. Dataset strings follow the reference CLI convention
``./real_graphs/<name>`` and multi-graph ``./real_graphs/a+b+c``.
"""

from __future__ import annotations

import os
import pickle

from gn_ode_sir_tpu.graphs.graph import Graph, graph_from_networkx

# The reference hardcodes `dataset[14:]` to strip './real_graphs/' from
# dataset paths (e.g. ode_nn_ngraph_sim.py:191). We parse properly instead.
GRAPH_STEM = "real_graphs"


def _stem(path: str) -> str:
    base = os.path.basename(path)
    return base[:-4] if base.endswith(".pkl") else base


def load_graph(path: str, n_random: int = 50, seed: int = 0) -> Graph:
    """Load one graph. ``path`` may omit the ``.pkl`` suffix.

    ``path == 'none'`` returns a G(n, 0.2) random graph, matching the
    reference fallback at ``ode_nn.py:403-405``.
    """
    if path == "none":
        import networkx as nx

        G = nx.fast_gnp_random_graph(n_random, 0.2, seed=seed)
        return graph_from_networkx(G, name=f"gnp{n_random}")

    import networkx as nx

    pkl = path if path.endswith(".pkl") else path + ".pkl"
    if not os.path.exists(pkl) and not os.path.isabs(pkl):
        # reference-style relative paths ('./real_graphs/karate',
        # monitorer-sim.py:23) resolve against GN_ODE_SIR_DATA_ROOT only —
        # no machine-specific fallback baked into library code; the CLI
        # layer may default the env var for its own host (cli/__init__.py)
        root = os.environ.get("GN_ODE_SIR_DATA_ROOT")
        if root and os.path.exists(os.path.join(root, pkl)):
            pkl = os.path.join(root, pkl)
    with open(pkl, "rb") as f:
        G = pickle.load(f)
    G = G.to_undirected()
    largest_cc = max(nx.connected_components(G), key=len)
    G = G.subgraph(largest_cc)
    return graph_from_networkx(G, name=_stem(path))


def load_graphs(dataset: str, root: str | None = None) -> list[Graph]:
    """Load a '+'-joined multi-graph dataset string.

    ``dataset`` may be either ``'./real_graphs/a+b+c'`` (reference style,
    ``ode_nn_ngraphs.py:157``) or a bare ``'a+b+c'`` with ``root`` given.
    """
    if root is None:
        root, names = os.path.split(dataset)
    else:
        names = dataset
    return [load_graph(os.path.join(root, name)) for name in names.split("+")]
