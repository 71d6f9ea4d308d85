"""Multi-graph experiment path: padding, per-trial adjacency gather, masked
loss, unseen-graph split, end-to-end fit over heterogeneous graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gn_ode_sir_tpu.graphs import pad_graphs
from gn_ode_sir_tpu.graphs.graph import graph_from_networkx
from gn_ode_sir_tpu.models import GNODE
from gn_ode_sir_tpu.ops import spmm_coo
from gn_ode_sir_tpu.train import (
    assemble_multigraph_trials,
    fit,
    multigraph_adj_fns,
    multigraph_split,
)


@pytest.fixture(scope="module")
def two_graphs():
    import networkx as nx

    g1 = graph_from_networkx(nx.cycle_graph(12), name="cyc12")
    g2 = graph_from_networkx(nx.wheel_graph(19), name="wheel19")
    return [g1, g2]


def test_multigraph_split_protocol():
    tr, va, te = multigraph_split([36, 36, 120])
    assert len(tr) == 72 and len(va) == 60 and len(te) == 60
    assert set(tr) == set(range(72))
    assert set(va) == set(range(72, 132))
    assert set(te) == set(range(132, 192))


def test_pad_graphs_shapes(two_graphs):
    batch = pad_graphs(two_graphs, node_multiple=8, edge_multiple=16)
    assert batch.n_max % 8 == 0 and batch.e_max % 16 == 0
    assert batch.n_max >= 19 and batch.num_graphs == 2
    # padding edges carry zero weight
    for g_i, g in enumerate(two_graphs):
        assert batch.edge_w[g_i].sum() == g.n_edges


def test_adj_fn_matches_per_graph_spmm(two_graphs):
    batch = pad_graphs(two_graphs, node_multiple=8, edge_multiple=16)
    adj_fn, node_mask_fn, aux = multigraph_adj_fns(batch, kind="coo")
    aux = jax.tree_util.tree_map(jnp.asarray, aux)
    gi = jnp.asarray([1, 0, 1], jnp.int32)
    adj = adj_fn(gi, aux)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, batch.n_max, 4)), jnp.float32)
    out = adj.matvec(x)
    for b, g_idx in enumerate([1, 0, 1]):
        g = two_graphs[g_idx]
        ref = spmm_coo(
            jnp.asarray(g.src), jnp.asarray(g.dst), x[b, : g.n_nodes], g.n_nodes
        )
        np.testing.assert_allclose(
            np.asarray(out[b, : g.n_nodes]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
    mask = node_mask_fn(gi, aux)
    assert float(mask[1].sum()) == two_graphs[0].n_nodes


def test_multigraph_dense_kind_matches_coo(two_graphs):
    batch = pad_graphs(two_graphs, node_multiple=8, edge_multiple=16)
    adj_coo, _, aux_c = multigraph_adj_fns(batch, kind="coo")
    adj_dense, _, aux_d = multigraph_adj_fns(batch, kind="dense")
    aux_c = jax.tree_util.tree_map(jnp.asarray, aux_c)
    aux_d = jax.tree_util.tree_map(jnp.asarray, aux_d)
    gi = jnp.asarray([0, 1, 1], jnp.int32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((3, batch.n_max, 4)), jnp.float32)
    a = adj_coo(gi, aux_c).matvec(x)
    b = adj_dense(gi, aux_d).matvec(x)
    # bf16 adjacency: values are {0,1} so only activation rounding differs
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)
    # gcn-normalized dense path keeps f32 exactness
    an, _, aux_cn = multigraph_adj_fns(batch, gcn_normalized=True, kind="coo")
    bn, _, aux_dn = multigraph_adj_fns(batch, gcn_normalized=True, kind="dense")
    aux_cn = jax.tree_util.tree_map(jnp.asarray, aux_cn)
    aux_dn = jax.tree_util.tree_map(jnp.asarray, aux_dn)
    np.testing.assert_allclose(
        np.asarray(an(gi, aux_cn).matvec(x)), np.asarray(bn(gi, aux_dn).matvec(x)),
        rtol=1e-4, atol=1e-5
    )


def test_multigraph_fit_end_to_end(two_graphs, tmp_path):
    rng = np.random.default_rng(0)
    per_graph = []
    counts = [6, 8]
    for g, c in zip(two_graphs, counts):
        per_graph.append([
            ([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
             float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
            for _ in range(c)
        ])
    batch, data = assemble_multigraph_trials(
        two_graphs, per_graph, sim=200, max_time=8,
        label_dirs=[str(tmp_path / g.name) for g in two_graphs],
    )
    assert data.num_trials == 14
    assert data.labels.shape[2] == batch.n_max
    # labels on padding nodes are zero
    n1 = two_graphs[0].n_nodes
    assert np.all(data.labels[0, :, n1:, :] == 0)

    tr, va, te = multigraph_split(counts)
    adj_fn, node_mask_fn, adj_aux = multigraph_adj_fns(batch)
    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    res = fit(
        model, optax.adam(1e-2), params, data, tr, va, te, adj_fn,
        adj_aux=adj_aux,
        epochs=5, batch_size=4, node_mask_fn=node_mask_fn, verbose=False,
    )
    assert res.history[-1][1] < res.history[0][1]
    assert np.isfinite(res.test_loss)
    # label cache populated per graph (reference layout)
    assert any((tmp_path / two_graphs[0].name).iterdir())


def test_padded_edges_stay_dst_sorted():
    """segment_sum is called with indices_are_sorted=True on padded rows;
    padding must therefore preserve dst order (pad dst = n_max-1). Violating
    the hint is XLA scatter UB — the round-1 intermittent TPU fault."""
    import numpy as np

    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.train.multigraph import _normalized_edges

    graphs = [load_graph("none", n_random=n, seed=s) for n, s in ((10, 0), (30, 1))]
    batch = pad_graphs(graphs, node_multiple=8, edge_multiple=32)
    for g in range(batch.src.shape[0]):
        assert np.all(np.diff(batch.dst[g]) >= 0), f"graph {g} dst not sorted"
    src, dst, w = _normalized_edges(batch)
    for g in range(dst.shape[0]):
        assert np.all(np.diff(dst[g]) >= 0), f"normalized graph {g} dst not sorted"
