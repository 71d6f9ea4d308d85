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


def test_adjacency_from_batch_gather(two_graphs):
    """The simple public per-trial gather helpers over a padded GraphBatch
    (``adjacency_from_batch`` → per-sample CooAdj; ``batch_index_graphs`` →
    raw rows) must reproduce each trial's own graph adjacency, with the
    padding rows contributing nothing (w=0 edges)."""
    from gn_ode_sir_tpu.graphs import batch_index_graphs
    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_batch

    batch = pad_graphs(two_graphs, node_multiple=8, edge_multiple=16)
    gi = np.array([0, 1, 0])
    adj = adjacency_from_batch(batch, gi)
    rng = np.random.default_rng(0)
    x = rng.random((3, batch.n_max, 4)).astype(np.float32)
    out = np.asarray(adj.matvec(jnp.asarray(x)))
    for k, g in enumerate(two_graphs[i] for i in gi):
        a = np.zeros((batch.n_max, batch.n_max), np.float32)
        a[: g.n_nodes, : g.n_nodes] = np.asarray(g.dense_adjacency)
        np.testing.assert_allclose(out[k], a @ x[k], rtol=1e-5, atol=1e-5)
    src, dst, edge_w, mask = batch_index_graphs(batch, gi)
    assert src.shape == (3, batch.e_max) and mask.shape == (3, batch.n_max)
    np.testing.assert_array_equal(src[1], batch.src[1])
    np.testing.assert_array_equal(mask[2], batch.node_mask[0])
    np.testing.assert_array_equal(edge_w[0], batch.edge_w[0])


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


def test_normalized_edges_matches_single_graph_oracle_with_loops():
    """_normalized_edges == ops.gcn_norm_edges per graph, including a graph
    that already carries a self-loop (fb-food ships 11): both must use
    add_remaining_self_loops semantics. The pre-fix version double-counted
    loaded loops, inflating those nodes' degrees (201/620 fb-food rows
    changed, 3.6% relative Frobenius)."""
    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.graphs.graph import graph_from_edges
    from gn_ode_sir_tpu.ops import gcn_norm_edges
    from gn_ode_sir_tpu.train.multigraph import _normalized_edges

    loopy = graph_from_edges(6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
                                 (1, 1), (4, 4)], name="loopy")
    plain = load_graph("none", n_random=10, seed=3)
    batch = pad_graphs([loopy, plain], node_multiple=8, edge_multiple=16)
    src, dst, w = _normalized_edges(batch)
    for gi, g in enumerate((loopy, plain)):
        s_ref, d_ref, w_ref = gcn_norm_edges(g)
        n = g.n_nodes
        dense_ref = np.zeros((n, n), np.float32)
        np.add.at(dense_ref, (d_ref, s_ref), w_ref)
        dense_mg = np.zeros((batch.n_max, batch.n_max), np.float32)
        np.add.at(dense_mg, (dst[gi], src[gi]), w[gi])
        np.testing.assert_allclose(dense_mg[:n, :n], dense_ref,
                                   rtol=1e-6, atol=1e-7)
        # padding rows contribute nothing
        assert dense_mg[n:].sum() == 0 and dense_mg[:, n:].sum() == 0
        assert np.all(np.diff(dst[gi]) >= 0), "dst-sorted hint preserved"


def test_epoch_batches_grouped_homogeneous():
    """Every grouped batch holds trials of one graph; coverage is exact
    (each trial once at weight 1, padding weight 0 from the same graph);
    the [n_batches, batch_size] shape is epoch-invariant."""
    from gn_ode_sir_tpu.train.data import epoch_batches_grouped

    graph_ids = np.asarray([0] * 5 + [1] * 9 + [2] * 4)
    idx = np.arange(18)
    rng = np.random.default_rng(0)
    bi, bw = epoch_batches_grouped(idx, graph_ids, 4, rng)
    bi2, _ = epoch_batches_grouped(idx, graph_ids, 4, rng)
    assert bi.shape == bi2.shape == (2 + 3 + 1, 4)
    for row, wrow in zip(bi, bw):
        assert len(set(graph_ids[row])) == 1  # homogeneous incl. padding
    # every trial appears exactly once with weight 1
    counted = {}
    for row, wrow in zip(bi, bw):
        for i, w in zip(row, wrow):
            if w == 1.0:
                counted[int(i)] = counted.get(int(i), 0) + 1
    assert counted == {int(i): 1 for i in idx}
    # eval (no rng): deterministic, ordered
    bi3, bw3 = epoch_batches_grouped(np.arange(5, 14), graph_ids, 8, None)
    assert bi3.shape == (2, 8)
    assert float(bw3.sum()) == 9.0


def _pallas2_vs_coo_setup(two_graphs):
    from gn_ode_sir_tpu.train import multigraph_adj_fns, multigraph_pallas2_fns

    batch = pad_graphs(two_graphs, node_multiple=8, edge_multiple=16)
    tr_fn, ev_fn, mask_fn, aux_p = multigraph_pallas2_fns(
        batch, eval_graph=-1, k_edges=32, r_rows=8, interpret=True)
    coo_fn, _, aux_c = multigraph_adj_fns(batch, kind="coo")
    aux_p = jax.tree_util.tree_map(jnp.asarray, aux_p)
    aux_c = jax.tree_util.tree_map(jnp.asarray, aux_c)
    return batch, tr_fn, ev_fn, mask_fn, aux_p, coo_fn, aux_c


def test_multigraph_pallas2_matches_coo(two_graphs):
    """Stacked-plan gathers (train bucket remap + full eval stack) must
    reproduce the COO per-sample SpMM on homogeneous batches, fwd and grad,
    including the batch-fold path in Pallas2Adj.matvec."""
    batch, tr_fn, ev_fn, _, aux_p, coo_fn, aux_c = _pallas2_vs_coo_setup(two_graphs)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, batch.n_max, 4)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((3, batch.n_max, 4)), jnp.float32)
    for g_id, fn, aux in [(0, tr_fn, aux_p), (0, ev_fn, aux_p),
                          (1, ev_fn, aux_p)]:
        gi = jnp.full((3,), g_id, jnp.int32)

        def loss(xx, fn=fn, aux=aux, gi=gi):
            return (fn(gi, aux).matvec(xx) * t).sum()

        def loss_c(xx, gi=gi):
            return (coo_fn(gi, aux_c).matvec(xx) * t).sum()

        np.testing.assert_allclose(float(loss(x)), float(loss_c(x)), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(jax.grad(loss)(x)), np.asarray(jax.grad(loss_c)(x)),
            rtol=1e-4, atol=1e-5,
        )


def test_multigraph_pallas2_gcn_normalized(two_graphs):
    """The GCN-normalized weighted edges flow through the stacked plans."""
    from gn_ode_sir_tpu.train import multigraph_adj_fns, multigraph_pallas2_fns

    batch = pad_graphs(two_graphs, node_multiple=8, edge_multiple=16)
    _, ev_fn, _, aux_p = multigraph_pallas2_fns(
        batch, gcn_normalized=True, eval_graph=-1, k_edges=32, r_rows=8,
        interpret=True)
    coo_fn, _, aux_c = multigraph_adj_fns(batch, gcn_normalized=True, kind="coo")
    aux_p = jax.tree_util.tree_map(jnp.asarray, aux_p)
    aux_c = jax.tree_util.tree_map(jnp.asarray, aux_c)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, batch.n_max, 4)), jnp.float32)
    gi = jnp.ones((2,), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(ev_fn(gi, aux_p).matvec(x)),
        np.asarray(coo_fn(gi, aux_c).matvec(x)), rtol=1e-4, atol=1e-5)


def test_pallas2_matvec_batch_fold(random_graph):
    """The shared-plan batch fold (g samples -> one [n, g*h] kernel pass)
    must be exact vs the per-sample path at every group size, including the
    b % g != 0 zero-pad case."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2Adj

    g = random_graph
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((5, g.n_nodes, 8)), jnp.float32)
    adj = Pallas2Adj.from_graph(g, k_edges=32, r_rows=8)
    ref = jnp.stack([adj.matvec(x[b][None])[0] for b in range(5)])
    for budget in (1, 64 * 4 * 1024, 1 << 30):  # g=1 / small groups / all
        adj2 = Pallas2Adj.from_graph(g, k_edges=32, r_rows=8)
        object.__setattr__(adj2, "_OUT_VMEM_BUDGET", budget)
        np.testing.assert_allclose(
            np.asarray(adj2.matvec(x)), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gcn_normalized", [False, True])
def test_pallas2_per_graph_grid_matches_padded(gcn_normalized):
    """per_graph_grid=True (lax.switch over per-graph true chunk counts)
    must be BIT-identical to the padded-row gather: padding chunks only ever
    add exact f32 zeros, so removing them changes no output bit — fwd and
    grad, on EVERY train row. Three graphs of distinct chunk counts make
    the train stack 2 rows, so the real lax.switch + p2t_remap/counts
    alignment is exercised (a 1-row stack takes the no-switch shortcut);
    the jit wrapper mirrors fit()'s compiled-epoch usage (the switch index
    is a traced value there). gcn_normalized=True is the geometry the
    GCN/GIN multigraph runs use (plans over edges + self-loops)."""
    import networkx as nx

    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx
    from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2SwitchAdj
    from gn_ode_sir_tpu.train import multigraph_pallas2_fns

    graphs = [graph_from_networkx(nx.cycle_graph(12), name="cyc12"),
              graph_from_networkx(nx.wheel_graph(19), name="wheel19"),
              graph_from_networkx(nx.path_graph(25), name="path25")]
    batch = pad_graphs(graphs, node_multiple=8, edge_multiple=16)
    kw = dict(eval_graph=-1, k_edges=32, r_rows=8, interpret=True,
              gcn_normalized=gcn_normalized)
    tr_s, ev_s, _, aux_s = multigraph_pallas2_fns(batch, **kw)
    tr_p, ev_p, _, aux_p = multigraph_pallas2_fns(
        batch, per_graph_grid=False, **kw)
    aux_s = jax.tree_util.tree_map(jnp.asarray, aux_s)
    aux_p = jax.tree_util.tree_map(jnp.asarray, aux_p)
    # the switch path engaged with >1 branch and distinct true counts
    probe_adj = tr_s(jnp.zeros((1,), jnp.int32), aux_s)
    assert isinstance(probe_adj, Pallas2SwitchAdj)
    assert len(probe_adj.counts_fwd) == 2
    assert probe_adj.counts_fwd[0] != probe_adj.counts_fwd[1]
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, batch.n_max, 4)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, batch.n_max, 4)), jnp.float32)
    for g_id, fs, fp, aa, ap in [(0, tr_s, tr_p, aux_s, aux_p),
                                 (1, tr_s, tr_p, aux_s, aux_p),
                                 (2, ev_s, ev_p, aux_s, aux_p)]:
        @jax.jit
        def out_s(xx, gi, aa=aa, fs=fs):
            return fs(gi, aa).matvec(xx)

        @jax.jit
        def grad_s(xx, gi, aa=aa, fs=fs):
            return jax.grad(lambda z: (fs(gi, aa).matvec(z) * t).sum())(xx)

        gi = jnp.full((2,), g_id, jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(out_s(x, gi)), np.asarray(fp(gi, ap).matvec(x)))
        np.testing.assert_array_equal(
            np.asarray(grad_s(x, gi)),
            np.asarray(jax.grad(
                lambda z: (fp(gi, ap).matvec(z) * t).sum())(x)))


def test_multigraph_fit_pallas2_end_to_end(two_graphs, tmp_path):
    """fit(batch_by_graph=True, eval_adj_fn=...) over the stacked plans
    trains and evaluates; loss decreases and matches the COO run's first
    epoch (same seed, same homogeneous batches)."""
    from gn_ode_sir_tpu.train import multigraph_adj_fns, multigraph_pallas2_fns

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
        two_graphs, per_graph, sim=100, max_time=8,
        label_dirs=[str(tmp_path / g.name) for g in two_graphs],
    )
    tr, va, te = multigraph_split(counts)
    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))

    tr_fn, ev_fn, mask_fn, aux_p = multigraph_pallas2_fns(
        batch, eval_graph=-1, k_edges=32, r_rows=8, interpret=True)
    res_p = fit(model, optax.adam(1e-2), params, data, tr, va, te, tr_fn,
                adj_aux=aux_p, eval_adj_fn=ev_fn, batch_by_graph=True,
                epochs=3, batch_size=4, node_mask_fn=mask_fn, verbose=False)
    assert np.isfinite(res_p.test_loss)
    assert res_p.history[-1][1] < res_p.history[0][1]

    coo_fn, mask_c, aux_c = multigraph_adj_fns(batch, kind="coo")
    res_c = fit(model, optax.adam(1e-2), params, data, tr, va, te, coo_fn,
                adj_aux=aux_c, batch_by_graph=True,
                epochs=3, batch_size=4, node_mask_fn=mask_c, verbose=False)
    # identical batches + exact kernels -> near-identical training traces
    np.testing.assert_allclose(res_p.history[-1][1], res_c.history[-1][1],
                               rtol=1e-3)
    np.testing.assert_allclose(res_p.test_loss, res_c.test_loss, rtol=1e-3)


def test_fit_refuses_pallas2_fns_without_grouped_batches(two_graphs, tmp_path):
    """The stacked-plan adj_fns apply graph_idx[0]'s plan to the whole
    minibatch; fit() must fail LOUDLY when called without
    batch_by_graph=True instead of silently training most samples against
    the wrong graph's connectivity."""
    from gn_ode_sir_tpu.train import multigraph_pallas2_fns

    rng = np.random.default_rng(3)
    per_graph = [[([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
                   0.3, 0.2)] * 2 for g in two_graphs]
    batch, data = assemble_multigraph_trials(
        two_graphs, per_graph, sim=50, max_time=6,
        label_dirs=[str(tmp_path / g.name) for g in two_graphs],
    )
    tr, va, te = multigraph_split([2, 2])
    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    tr_fn, ev_fn, mask_fn, aux_p = multigraph_pallas2_fns(
        batch, eval_graph=-1, k_edges=32, r_rows=8, interpret=True)
    with pytest.raises(ValueError, match="graph-homogeneous"):
        fit(model, optax.adam(1e-2), params, data, tr, va, te, tr_fn,
            adj_aux=aux_p, eval_adj_fn=ev_fn, batch_by_graph=False,
            epochs=1, batch_size=2, node_mask_fn=mask_fn, verbose=False)


def test_auto_kind_delegates_to_resolver(two_graphs, monkeypatch):
    """multigraph_adj_fns(kind='auto') must share one threshold with
    resolve_mg_kind — and fail loudly (pointing at multigraph_pallas2_fns)
    when the resolver picks the stacked-Pallas2 backend this function
    cannot serve, instead of silently falling back to the slowest COO."""
    import gn_ode_sir_tpu.train.multigraph as mg

    batch = pad_graphs(two_graphs)
    assert mg.resolve_mg_kind(batch) == "dense"  # tiny batch under limit
    # force the over-limit branch
    monkeypatch.setattr(mg, "MG_DENSE_BYTES_LIMIT", 1)
    kind = mg.resolve_mg_kind(batch)
    if kind == "pallas2":  # TPU backend
        with pytest.raises(ValueError, match="multigraph_pallas2_fns"):
            mg.multigraph_adj_fns(batch, kind="auto")
    else:  # CPU keeps COO (interpret-mode Pallas crawls)
        assert kind == "coo"
        adj_fn, _, aux = mg.multigraph_adj_fns(batch, kind="auto")
        assert "src" in aux  # the COO aux layout


def test_multigraph_auto_fns_above_dense_limit(two_graphs, tmp_path, monkeypatch):
    """The PUBLIC zero-config path at over-dense-limit scale: auto resolves
    to the stacked-Pallas2 backend (no ValueError), returns the uniform
    MultigraphConnectivity, and fit(**conn.fit_kwargs()) trains an epoch —
    a library user following the advertised API never has to know the
    backend's calling convention (VERDICT r3 weak #3)."""
    import jax as jax_mod

    import gn_ode_sir_tpu.train.multigraph as mg
    from gn_ode_sir_tpu.train import multigraph_auto_fns

    rng = np.random.default_rng(7)
    counts = [4, 6]
    per_graph = [
        [([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
          float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
         for _ in range(c)]
        for g, c in zip(two_graphs, counts)
    ]
    batch, data = assemble_multigraph_trials(
        two_graphs, per_graph, sim=100, max_time=8,
        label_dirs=[str(tmp_path / g.name) for g in two_graphs],
    )
    # force the over-limit branch and the TPU resolver decision; the kernel
    # itself runs in interpret mode on the CPU test backend
    monkeypatch.setattr(mg, "MG_DENSE_BYTES_LIMIT", 1)
    monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
    conn = multigraph_auto_fns(batch, k_edges=32, r_rows=8, interpret=True)
    assert conn.kind == "pallas2"
    assert conn.batch_by_graph is True
    assert conn.eval_adj_fn is not conn.adj_fn  # separate train/eval stacks

    tr, va, te = multigraph_split(counts)
    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    res = fit(model, optax.adam(1e-2), params, data, tr, va, te,
              **conn.fit_kwargs(), epochs=2, batch_size=4, verbose=False)
    assert np.isfinite(res.test_loss)
    assert res.history[-1][1] < res.history[0][1]

    # under the limit the same call returns the dense backend, uniformly
    monkeypatch.setattr(mg, "MG_DENSE_BYTES_LIMIT", 2 << 30)
    conn_d = multigraph_auto_fns(batch)
    assert conn_d.kind == "dense" and conn_d.batch_by_graph is False
    res_d = fit(model, optax.adam(1e-2), params, data, tr, va, te,
                **conn_d.fit_kwargs(), epochs=2, batch_size=4, verbose=False)
    assert np.isfinite(res_d.test_loss)


def test_multigraph_auto_fns_warns_on_unused_pallas_kwargs(two_graphs):
    """Scale-portable callers may set kernel knobs 'for when it's big' —
    when the resolver picks dense/coo, say so instead of silently ignoring."""
    import warnings

    from gn_ode_sir_tpu.train import multigraph_auto_fns

    batch = pad_graphs(two_graphs)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        conn = multigraph_auto_fns(batch, k_edges=256)
    assert conn.kind == "dense"
    assert any("k_edges" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        multigraph_auto_fns(batch)
    assert not w

    # an EXPLICIT train_node_view=True on a backend with no sliced variant
    # (coo) must warn rather than silently run full-width; the env-driven
    # default must stay silent for coo users
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        conn_c = multigraph_auto_fns(batch, kind="coo", train_node_view=True)
    assert conn_c.kind == "coo"
    assert any("train_node_view" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        multigraph_auto_fns(batch, kind="coo")
    assert not w

def _node_view_setup(tmp_path, sim=60, max_time=6):
    """Graphs where the train bucket (128) is genuinely below n_max (~200):
    the node-view path only engages when rounding the largest TRAIN graph
    up to 128 still undercuts the eval graph's padding."""
    import networkx as nx

    graphs = [graph_from_networkx(nx.cycle_graph(30), name="cyc30"),
              graph_from_networkx(nx.path_graph(200), name="path200")]
    rng = np.random.default_rng(21)
    counts = [4, 6]
    per_graph = [
        [([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
          float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
         for _ in range(c)]
        for g, c in zip(graphs, counts)
    ]
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, sim=sim, max_time=max_time,
        label_dirs=[str(tmp_path / g.name) for g in graphs],
    )
    return batch, data, multigraph_split(counts)


def test_train_node_view_pallas2_matches_full_width(tmp_path, monkeypatch):
    """multigraph_auto_fns' pallas2 path trains at the TRAIN bucket's node
    width (adj_fn.n_view) — the probe-measured enron lever (RESULTS.md r4:
    train-step cost is n_max-proportional HBM traffic). Sliced rows are
    all-padding for every train trial, so the whole training trace must
    match the full-width run."""
    import jax as jax_mod

    import gn_ode_sir_tpu.train.multigraph as mg
    from gn_ode_sir_tpu.train import multigraph_auto_fns, multigraph_pallas2_fns

    batch, data, (tr, va, te) = _node_view_setup(tmp_path)
    monkeypatch.delenv("GN_MG_TRAIN_NODE_VIEW", raising=False)
    monkeypatch.setattr(mg, "MG_DENSE_BYTES_LIMIT", 1)
    monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
    conn = multigraph_auto_fns(batch, k_edges=32, r_rows=8, interpret=True)
    assert conn.kind == "pallas2"
    assert conn.adj_fn.n_view == 128  # cyc30 -> 128 < n_max (200)
    assert conn.adj_fn.valid_train_graphs == frozenset([0])
    assert not hasattr(conn.eval_adj_fn, "n_view")  # eval at full width

    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    res_v = fit(model, optax.adam(1e-2), params, data, tr, va, te,
                **conn.fit_kwargs(), epochs=3, batch_size=4, verbose=False)

    tr_fn, ev_fn, mask_fn, aux_p = multigraph_pallas2_fns(
        batch, eval_graph=-1, k_edges=32, r_rows=8, interpret=True,
        train_node_view=False)
    assert not hasattr(tr_fn, "n_view")
    res_f = fit(model, optax.adam(1e-2), params, data, tr, va, te, tr_fn,
                adj_aux=aux_p, eval_adj_fn=ev_fn, batch_by_graph=True,
                node_mask_fn=mask_fn, epochs=3, batch_size=4, verbose=False)
    # same batches, same kernels, only reduction shapes differ
    for (e1, tl1, vl1), (e2, tl2, vl2) in zip(res_v.history, res_f.history):
        np.testing.assert_allclose(tl1, tl2, rtol=1e-5)
        np.testing.assert_allclose(vl1, vl2, rtol=1e-5)
    np.testing.assert_allclose(res_v.test_loss, res_f.test_loss, rtol=1e-5)


def test_train_node_view_dense_matches_full_width(tmp_path, monkeypatch):
    """The dense backend's pre-sliced train stack (aux['dense_train']) must
    reproduce the full-width dense run's training trace, and the env escape
    hatch must disable the view."""
    from gn_ode_sir_tpu.train import multigraph_auto_fns

    batch, data, (tr, va, te) = _node_view_setup(tmp_path)
    monkeypatch.delenv("GN_MG_TRAIN_NODE_VIEW", raising=False)
    conn = multigraph_auto_fns(batch, kind="dense")
    assert conn.adj_fn.n_view == 128
    assert "dense_train" in conn.aux

    monkeypatch.setenv("GN_MG_TRAIN_NODE_VIEW", "0")
    conn_f = multigraph_auto_fns(batch, kind="dense")
    assert not hasattr(conn_f.adj_fn, "n_view")
    assert "dense_train" not in conn_f.aux

    # explicit kwarg beats the env default on the dense branch too (and,
    # being a both-backend knob, must not trip the unused-Pallas warning)
    monkeypatch.delenv("GN_MG_TRAIN_NODE_VIEW", raising=False)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        conn_k = multigraph_auto_fns(batch, kind="dense",
                                     train_node_view=False)
    assert not hasattr(conn_k.adj_fn, "n_view")
    assert "dense_train" not in conn_k.aux

    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    res_v = fit(model, optax.adam(1e-2), params, data, tr, va, te,
                **conn.fit_kwargs(), epochs=3, batch_size=4, verbose=False)
    res_f = fit(model, optax.adam(1e-2), params, data, tr, va, te,
                **conn_f.fit_kwargs(), epochs=3, batch_size=4, verbose=False)
    for (e1, tl1, vl1), (e2, tl2, vl2) in zip(res_v.history, res_f.history):
        np.testing.assert_allclose(tl1, tl2, rtol=1e-5)
        np.testing.assert_allclose(vl1, vl2, rtol=1e-5)
    np.testing.assert_allclose(res_v.test_loss, res_f.test_loss, rtol=1e-5)


def test_train_node_view_refuses_eval_graph_trials(tmp_path, monkeypatch):
    """A node-view adjacency fed eval-graph trials in train_idx would
    silently drop their high rows; fit() must refuse loudly."""
    from gn_ode_sir_tpu.train import multigraph_auto_fns

    batch, data, (tr, va, te) = _node_view_setup(tmp_path)
    monkeypatch.delenv("GN_MG_TRAIN_NODE_VIEW", raising=False)
    conn = multigraph_auto_fns(batch, kind="dense")
    assert conn.adj_fn.n_view == 128
    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    bad_tr = np.concatenate([tr, va[:1]])  # one unseen-graph trial
    with pytest.raises(ValueError, match="node view"):
        fit(model, optax.adam(1e-2), params, data, bad_tr, va, te,
            **conn.fit_kwargs(), epochs=1, batch_size=4, verbose=False)


def test_train_node_view_refuses_reuse_for_eval(tmp_path, monkeypatch):
    """Passing a node-view train adjacency as the ONLY adj_fn (eval_adj_fn
    omitted — correct dense-backend usage before the node view existed) must
    raise, not silently evaluate val/test eval-graph trials against a sliced
    TRAIN graph's adjacency."""
    from gn_ode_sir_tpu.train import multigraph_auto_fns

    batch, data, (tr, va, te) = _node_view_setup(tmp_path)
    monkeypatch.delenv("GN_MG_TRAIN_NODE_VIEW", raising=False)
    conn = multigraph_auto_fns(batch, kind="dense")
    assert conn.adj_fn.n_view == 128
    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="eval_adj_fn"):
        fit(model, optax.adam(1e-2), params, data, tr, va, te,
            conn.adj_fn, adj_aux=conn.aux, node_mask_fn=conn.node_mask_fn,
            epochs=1, batch_size=4, verbose=False)
