"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This box registers a remote TPU ('axon') in every python process via
sitecustomize; tests must run on the host CPU with 8 virtual devices so
multi-device sharding paths execute under CI (SURVEY.md §4).
"""

import os
import sys

# Must happen before any jax BACKEND initialization (jax may already be
# imported by a sitecustomize that registers a TPU plugin — config.update
# still wins as long as no client has been created).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) may already have
# registered the TPU plugin; defend by dropping the path so child imports
# don't pick it up.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if jax.default_backend() != "cpu":  # pragma: no cover
    raise RuntimeError(
        "tests must run on CPU; invoke as: env PYTHONPATH= JAX_PLATFORMS=cpu "
        "python -m pytest tests/"
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def karate():
    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.graphs.graph import graph_from_edges
    import networkx as nx

    path = os.path.join(REFERENCE_ROOT, "real_graphs/karate.pkl")
    if os.path.exists(path):
        return load_graph(path)
    return _from_nx(nx.karate_club_graph())


def _from_nx(G):
    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx

    return graph_from_networkx(G, name="karate")


@pytest.fixture(scope="session")
def random_graph():
    import networkx as nx
    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx

    G = nx.fast_gnp_random_graph(50, 0.12, seed=3)
    G = G.subgraph(max(nx.connected_components(G), key=len))
    return graph_from_networkx(G, name="gnp50")


@pytest.fixture(scope="session")
def karate_fixture_dir():
    d = os.path.join(REFERENCE_ROOT, "multi-graph-1/Experiments-seed2-karate")
    if not os.path.isdir(d):
        pytest.skip("reference karate fixtures not available")
    return d
