"""Vmapped ensemble training (train/ensemble.py): member-by-member equality
with sequential fit(), mesh sharding of the member axis, exact-trace resume.

The reference's repeat protocol is K sequential subprocesses differing only
in model init (monitorer-ngraphs.py:20); fit_ensemble must reproduce each of
those runs exactly while compiling once.
"""

import numpy as np
import jax
import optax
import pytest

from gn_ode_sir_tpu.models import GNODE
from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
from gn_ode_sir_tpu.train import (
    build_trial_data,
    fit,
    fit_ensemble,
    init_ensemble,
    split_indices,
)


SEEDS = [3, 7, 11]


def _dataset(g, N=12, T=8):
    from gn_ode_sir_tpu.sim import sir_classical

    rng = np.random.default_rng(0)
    seed_sets, betas, gammas, triples = [], [], [], []
    for _ in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        beta, gamma = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, beta, gamma, max_time=T)
        seed_sets.append(list(seeds))
        betas.append(beta)
        gammas.append(gamma)
        triples.append((s_t, i_t, r_t))
    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    return data, split_indices(N, (0.6, 0.2, 0.2)), T


def _model(T):
    return GNODE(hidden=8, max_time=T)


def test_fit_ensemble_matches_sequential(random_graph):
    """Each ensemble member's training trace equals the sequential
    fit(seed=s) run with the same init — repeats are semantically unchanged,
    only fused into one program."""
    g = random_graph
    data, (tr, va, te), T = _dataset(g)
    model = _model(T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    epochs, bs = 5, 4

    seq = []
    for s in SEEDS:
        params = model.init(jax.random.PRNGKey(s))
        seq.append(fit(model, opt, params, data, tr, va, te,
                       lambda gi, aux: aux["adj"], adj_aux={"adj": adj},
                       epochs=epochs, batch_size=bs, seed=s, verbose=False))

    stack = init_ensemble(model, SEEDS)
    ens = fit_ensemble(model, opt, stack, data, tr, va, te,
                       lambda gi, aux: aux["adj"], adj_aux={"adj": adj},
                       seeds=SEEDS, epochs=epochs, batch_size=bs,
                       verbose=False)

    for j, r in enumerate(seq):
        # per-epoch train/val losses
        for e in range(epochs):
            _, tr_seq, va_seq = r.history[e]
            _, tr_ens, va_ens = ens.history[e]
            np.testing.assert_allclose(tr_ens[j], tr_seq, rtol=2e-5, atol=1e-7)
            np.testing.assert_allclose(va_ens[j], va_seq, rtol=2e-5, atol=1e-7)
        assert int(ens.best_epoch[j]) == r.best_epoch
        np.testing.assert_allclose(ens.best_val_loss[j], r.best_val_loss,
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(ens.test_loss[j], r.test_loss,
                                   rtol=2e-5, atol=1e-7)
        # final params: batched (vmap) matmuls lower differently than single
        # ones, so float drift compounds over the optimizer steps — the
        # per-epoch LOSS equalities above are the semantic contract; params
        # only need to stay in the same basin
        for a, b in zip(jax.tree_util.tree_leaves(ens.params),
                        jax.tree_util.tree_leaves(r.params)):
            np.testing.assert_allclose(np.asarray(a)[j], np.asarray(b),
                                       rtol=5e-3, atol=1e-4)


def test_fit_ensemble_sharded_matches_unsharded(random_graph):
    """Sharding the member axis over an 8-device mesh changes nothing but
    placement (repeats are embarrassingly parallel)."""
    from jax.sharding import Mesh

    g = random_graph
    data, (tr, va, te), T = _dataset(g, N=10)
    model = _model(T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    seeds = list(range(8))
    kw = dict(adj_aux={"adj": adj}, seeds=seeds, epochs=3, batch_size=4,
              verbose=False)

    stack = init_ensemble(model, seeds)
    plain = fit_ensemble(model, opt, stack, data, tr, va, te,
                         lambda gi, aux: aux["adj"], **kw)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("ensemble",))
    stack = init_ensemble(model, seeds)
    shard = fit_ensemble(model, opt, stack, data, tr, va, te,
                         lambda gi, aux: aux["adj"], mesh=mesh, **kw)

    np.testing.assert_allclose(shard.best_val_loss, plain.best_val_loss,
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(shard.test_loss, plain.test_loss,
                               rtol=2e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(shard.params),
                    jax.tree_util.tree_leaves(plain.params)):
        # partitioned lowering reorders float ops like vmap does (see the
        # sequential-equality test) — losses above are the tight contract
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_fit_ensemble_2d_ensemble_x_data_matches_unsharded(random_graph):
    """2-D composition (round 5): members shard over 'ensemble' while the
    trial store's row axis shards over 'data' — GSPMD inserts the gather
    collectives; numerics must match the unsharded run."""
    from jax.sharding import Mesh

    g = random_graph
    data, (tr, va, te), T = _dataset(g, N=10)
    model = _model(T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    seeds = list(range(4))
    kw = dict(adj_aux={"adj": adj}, seeds=seeds, epochs=3, batch_size=4,
              verbose=False)

    stack = init_ensemble(model, seeds)
    plain = fit_ensemble(model, opt, stack, data, tr, va, te,
                         lambda gi, aux: aux["adj"], **kw)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("ensemble", "data"))
    stack = init_ensemble(model, seeds)
    shard = fit_ensemble(model, opt, stack, data, tr, va, te,
                         lambda gi, aux: aux["adj"], mesh=mesh,
                         data_axis="data", **kw)

    np.testing.assert_allclose(shard.best_val_loss, plain.best_val_loss,
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(shard.test_loss, plain.test_loss,
                               rtol=2e-5, atol=1e-7)

    import pytest

    with pytest.raises(ValueError, match="data_axis"):
        fit_ensemble(model, opt, init_ensemble(model, seeds), data, tr, va,
                     te, lambda gi, aux: aux["adj"], mesh=mesh,
                     data_axis="nope", **kw)


def test_fit_ensemble_resume_reproduces_trace(random_graph, tmp_path):
    """Crash + resume at the ensemble level reproduces the uninterrupted
    run exactly (same contract as fit()'s resume test)."""
    g = random_graph
    data, (tr, va, te), T = _dataset(g, N=10)
    model = _model(T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    seeds = [1, 2]
    kw = dict(adj_aux={"adj": adj}, seeds=seeds, batch_size=4, verbose=False,
              track_test_per_trial=True)

    full = fit_ensemble(model, opt, init_ensemble(model, seeds), data,
                        tr, va, te, lambda gi, aux: aux["adj"],
                        epochs=6, **kw)

    ck = str(tmp_path / "ens")
    fit_ensemble(model, opt, init_ensemble(model, seeds), data, tr, va, te,
                 lambda gi, aux: aux["adj"], epochs=3, checkpoint_dir=ck,
                 checkpoint_every=1, **kw)
    res = fit_ensemble(model, opt, init_ensemble(model, seeds), data,
                       tr, va, te, lambda gi, aux: aux["adj"], epochs=6,
                       checkpoint_dir=ck, checkpoint_every=1, resume=True,
                       **kw)

    np.testing.assert_allclose(res.best_val_loss, full.best_val_loss,
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(res.best_epoch, full.best_epoch)
    # the OOD per-trial vector rides the checkpoint (restored, then kept or
    # overwritten exactly as the uninterrupted run would)
    np.testing.assert_allclose(res.test_loss_all, full.test_loss_all,
                               rtol=2e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(res.params),
                    jax.tree_util.tree_leaves(full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fit_ensemble_resume_with_ood_newly_enabled(random_graph, tmp_path):
    """Resuming an ensemble with track_test_per_trial=True from a
    checkpoint written WITHOUT it must restore through the
    best_params-alone rung of the layout ladder (same regression as
    fit()'s: the ladder lacked that combination and resume hard-failed)."""
    g = random_graph
    data, (tr, va, te), T = _dataset(g, N=10)
    model = _model(T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    seeds = [1, 2]
    ck = str(tmp_path / "ens")
    fit_ensemble(model, opt, init_ensemble(model, seeds), data, tr, va, te,
                 lambda gi, aux: aux["adj"], adj_aux={"adj": adj},
                 seeds=seeds, batch_size=4, verbose=False,
                 epochs=3, checkpoint_dir=ck, checkpoint_every=1)
    res = fit_ensemble(model, opt, init_ensemble(model, seeds), data,
                       tr, va, te, lambda gi, aux: aux["adj"],
                       adj_aux={"adj": adj}, seeds=seeds, batch_size=4,
                       verbose=False, epochs=5, checkpoint_dir=ck,
                       resume=True, track_test_per_trial=True)
    assert res.history[0][0] == 3
    assert res.test_loss_all is not None
    assert res.test_loss_all.shape == (2, len(te))


@pytest.mark.parametrize("scan", ["0", "1"])
def test_fit_ensemble_per_trial_tracking(random_graph, scan, monkeypatch):
    """``track_test_per_trial`` keeps each member's [n_test] loss vector (the
    OOD CSVs' payload, ``ode_nn_ngraph_sim.py:483``) equal to sequential
    ``fit``'s, on BOTH member routings (vmap and the plan-stack lax.map)."""
    monkeypatch.setenv("GN_ENS_SCAN", scan)
    g = random_graph
    data, (tr, va, te), T = _dataset(g, N=10)
    model = _model(T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    epochs, bs = 3, 4
    seeds = SEEDS[:2]

    seq = []
    for s in seeds:
        params = model.init(jax.random.PRNGKey(s))
        seq.append(fit(model, opt, params, data, tr, va, te,
                       lambda gi, aux: aux["adj"], adj_aux={"adj": adj},
                       epochs=epochs, batch_size=bs, seed=s, verbose=False,
                       track_test_per_trial=True))

    stack = init_ensemble(model, seeds)
    ens = fit_ensemble(model, opt, stack, data, tr, va, te,
                       lambda gi, aux: aux["adj"], adj_aux={"adj": adj},
                       seeds=seeds, epochs=epochs, batch_size=bs,
                       verbose=False, track_test_per_trial=True)

    assert ens.test_loss_all.shape == (len(seeds), len(te))
    for j, r in enumerate(seq):
        np.testing.assert_allclose(ens.test_loss_all[j], r.test_loss_all,
                                   rtol=2e-5, atol=1e-7)


def test_fit_ensemble_rejects_mismatched_stack(random_graph):
    g = random_graph
    data, (tr, va, te), T = _dataset(g, N=10)
    model = _model(T)
    adj = adjacency_from_graph(g)
    stack = init_ensemble(model, [0, 1])
    with pytest.raises(ValueError, match="leading axis"):
        fit_ensemble(model, optax.adam(1e-2), stack, data, tr, va, te,
                     lambda gi, aux: aux["adj"], adj_aux={"adj": adj},
                     seeds=[0, 1, 2], epochs=1, verbose=False)


def test_fit_ensemble_pallas2_multigraph_matches_sequential(tmp_path):
    """The stacked-Pallas2 multigraph backend (the enron-scale matrix path)
    composes with the ensemble vmap: member 0 of a K=2 ensemble reproduces
    the sequential fit(seed=seeds[0]) trace on the same grouped batches."""
    import networkx as nx
    import optax

    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx
    from gn_ode_sir_tpu.train import (
        assemble_multigraph_trials,
        multigraph_pallas2_fns,
        multigraph_split,
    )

    graphs = [graph_from_networkx(nx.cycle_graph(12), name="cyc12"),
              graph_from_networkx(nx.wheel_graph(19), name="wheel19")]
    rng = np.random.default_rng(0)
    counts = [6, 8]
    per_graph = [[
        ([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
         float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
        for _ in range(c)
    ] for g, c in zip(graphs, counts)]
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, sim=100, max_time=8,
        label_dirs=[str(tmp_path / g.name) for g in graphs],
    )
    tr, va, te = multigraph_split(counts)
    model = GNODE(hidden=8, max_time=8)
    opt = optax.adam(1e-2)
    tr_fn, ev_fn, mask_fn, aux_p = multigraph_pallas2_fns(
        batch, eval_graph=-1, k_edges=32, r_rows=8, interpret=True)
    kw = dict(adj_aux=aux_p, eval_adj_fn=ev_fn, batch_by_graph=True,
              epochs=3, batch_size=4, node_mask_fn=mask_fn, verbose=False)

    seeds = [4, 9]
    seq = fit(model, opt, model.init(jax.random.PRNGKey(seeds[0])),
              data, tr, va, te, tr_fn, seed=seeds[0], **kw)
    ens = fit_ensemble(model, opt, init_ensemble(model, seeds), data,
                       tr, va, te, tr_fn, seeds=seeds, **kw)
    assert np.isfinite(np.asarray(ens.test_loss)).all()
    for e in range(3):
        np.testing.assert_allclose(ens.history[e][1][0], seq.history[e][1],
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(ens.history[e][2][0], seq.history[e][2],
                                   rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(ens.test_loss[0], seq.test_loss,
                               rtol=2e-5, atol=1e-7)
