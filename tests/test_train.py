"""Training-layer tests: loss semantics, splits, batching, end-to-end fit,
checkpoint round-trip, CSV sink schema."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gn_ode_sir_tpu.models import GNODE
from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
from gn_ode_sir_tpu.train import (
    build_trial_data,
    fit,
    l1_sir_loss,
    restore_checkpoint,
    save_checkpoint,
    split_indices,
)
from gn_ode_sir_tpu.train.data import epoch_batches


def test_l1_loss_matches_reference_semantics():
    """Mean |pred - y| over t >= 1 (ode_nn_ngraph_sim.py:234)."""
    rng = np.random.default_rng(0)
    pred = rng.random((5, 2, 7, 3))  # [T, B, n, 3]
    y = rng.random((2, 5, 7, 3))  # [B, T, n, 3]
    expect = np.abs(np.transpose(pred, (1, 0, 2, 3))[:, 1:] - y[:, 1:]).mean()
    got = float(l1_sir_loss(jnp.asarray(pred), jnp.asarray(y)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_l1_loss_trial_weights_ignore_padding():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((5, 3, 7, 3)))
    y = jnp.asarray(rng.random((3, 5, 7, 3)))
    w = jnp.asarray([1.0, 1.0, 0.0])
    got = float(l1_sir_loss(pred, y, trial_weight=w))
    expect = float(l1_sir_loss(pred[:, :2], y[:2]))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_split_indices_reference_boundaries():
    tr, va, te = split_indices(200, (0.6, 0.2, 0.2))
    assert len(tr) == 120 and len(va) == 40 and len(te) == 40
    # int-floor semantics on awkward sizes
    tr, va, te = split_indices(7, (0.6, 0.2, 0.2))
    assert len(tr) == 4 and (len(tr) + len(va) + len(te)) == 7


def test_epoch_batches_padding():
    bi, bw = epoch_batches(7, 3, None)
    assert bi.shape == (3, 3) and bw.shape == (3, 3)
    assert bw.sum() == 7.0
    assert bw[-1, -1] == 0.0 and bw[-1, -2] == 0.0


def test_fit_end_to_end(random_graph, tmp_path):
    """Tiny full protocol: loss decreases, best-val test populated,
    checkpoint round-trips."""
    from gn_ode_sir_tpu.sim import sir_classical

    g = random_graph
    rng = np.random.default_rng(0)
    N, T = 12, 10
    seed_sets, betas, gammas, triples = [], [], [], []
    for k in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        beta, gamma = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, beta, gamma, max_time=T)
        seed_sets.append(list(seeds))
        betas.append(beta)
        gammas.append(gamma)
        triples.append((s_t, i_t, r_t))  # mean-field labels: cheap + smooth

    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    res = fit(
        model, opt, params, data, tr, va, te, lambda gi: adj,
        epochs=8, batch_size=4, verbose=False,
    )
    first_train = res.history[0][1]
    last_train = res.history[-1][1]
    assert last_train < first_train
    assert np.isfinite(res.test_loss)
    assert res.best_epoch >= 0

    path = save_checkpoint(str(tmp_path), {"params": res.params, "epoch": res.best_epoch})
    restored = restore_checkpoint(str(tmp_path), {"params": res.params, "epoch": 0})
    leaves_a = jax.tree_util.tree_leaves(res.params)
    leaves_b = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_checkpoint_resume(random_graph, tmp_path):
    """Interrupted fit resumes from checkpoint and continues to completion."""
    from gn_ode_sir_tpu.sim import sir_classical

    g = random_graph
    rng = np.random.default_rng(1)
    N, T = 8, 8
    seed_sets, betas, gammas, triples = [], [], [], []
    for _ in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        b, gm = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, b, gm, max_time=T)
        seed_sets.append(list(seeds)); betas.append(b); gammas.append(gm)
        triples.append((s_t, i_t, r_t))
    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    ckpt = str(tmp_path / "ck")

    params = model.init(jax.random.PRNGKey(0))
    # "crash" after 3 epochs (checkpoint written at end)
    res1 = fit(model, opt, params, data, tr, va, te, lambda gi: adj,
               epochs=3, batch_size=4, verbose=False, checkpoint_dir=ckpt)
    # resume to epoch 6
    res2 = fit(model, opt, params, data, tr, va, te, lambda gi: adj,
               epochs=6, batch_size=4, verbose=False,
               checkpoint_dir=ckpt, resume=True)
    assert res2.history[0][0] == 3  # continued where it stopped
    assert len(res2.history) == 3
    assert np.isfinite(res2.test_loss)


def test_resumed_short_tail_still_writes_final_checkpoint(random_graph, tmp_path):
    """A resumed run whose short tail never re-arms the auto cadence must
    still write the end-of-run checkpoint: the directory's state has to
    reflect the COMPLETED run, not the crash-era epoch (regression: the
    final-save gate skipped it whenever checkpoint_auto_s armed the dir and
    checkpoint_every stayed 0)."""
    from gn_ode_sir_tpu.sim import sir_classical
    from gn_ode_sir_tpu.train.checkpoint import restore_checkpoint

    g = random_graph
    rng = np.random.default_rng(2)
    N, T = 8, 8
    seed_sets, betas, gammas, triples = [], [], [], []
    for _ in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        b, gm = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, b, gm, max_time=T)
        seed_sets.append(list(seeds)); betas.append(b); gammas.append(gm)
        triples.append((s_t, i_t, r_t))
    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    ckpt = str(tmp_path / "ck")

    params = model.init(jax.random.PRNGKey(0))
    # leg 1: explicit periodic checkpoints, "crash" leaves epoch-3 state
    fit(model, opt, params, data, tr, va, te, lambda gi: adj,
        epochs=4, batch_size=4, verbose=False,
        checkpoint_dir=ckpt, checkpoint_every=4)
    # leg 2: resume for a 2-epoch tail with ONLY the auto cadence armed
    # (checkpoint_every=0, huge checkpoint_auto_s -> never triggers)
    res = fit(model, opt, params, data, tr, va, te, lambda gi: adj,
              epochs=6, batch_size=4, verbose=False,
              checkpoint_dir=ckpt, resume=True, checkpoint_auto_s=1e9)
    assert res.history[0][0] == 4
    # current layout: the serving snapshot (round 4) and test wall time
    # (round 5) ride every periodic checkpoint
    target = {"params": params, "opt_state": res.opt_state, "epoch": 0,
              "best_val": 0.0, "best_epoch": 0, "test_loss": 0.0,
              "best_params": params, "test_time": 0.0}
    st = restore_checkpoint(ckpt, target)
    assert int(st["epoch"]) == 5, "final checkpoint must be the completed run"


def test_restore_layout_ladder_spans_generations(tmp_path):
    """restore_with_layout_ladder restores every checkpoint generation:
    full current layout, older layouts missing newer optional groups, and
    the bare original layout — one shared ladder for fit()/fit_ensemble()."""
    from gn_ode_sir_tpu.train.checkpoint import (
        restore_with_layout_ladder,
        save_checkpoint,
    )

    base = {"params": np.arange(4, dtype=np.float32), "epoch": 3}
    groups = [{"test_time": 0.0},
              {"best_params": np.zeros(4, np.float32)}]
    cases = {
        "full": {**base, "test_time": 1.5,
                 "best_params": np.ones(4, np.float32)},
        "r4": {**base, "best_params": np.ones(4, np.float32)},
        "bare": dict(base),
    }
    for name, state in cases.items():
        d = str(tmp_path / name)
        save_checkpoint(d, state)
        st = restore_with_layout_ladder(d, dict(base), groups)
        assert int(st["epoch"]) == 3
        assert ("best_params" in st) == ("best_params" in state)
        # and the ladder must NOT fabricate keys absent from the checkpoint
        # (a lenient restore mode answering the full-target rung for an
        # older generation would inject test_time=0.0 silently)
        assert ("test_time" in st) == ("test_time" in state)
        if name == "full":
            assert float(st["test_time"]) == 1.5


def test_resume_with_ood_newly_enabled(random_graph, tmp_path):
    """Resuming with track_test_per_trial=True from a checkpoint written
    WITHOUT it (best_params present, test_loss_all absent — e.g. a run
    restarted with --out_of_dist newly enabled) must restore through the
    best_params-alone rung of the layout ladder, not hard-fail (regression:
    the ladder tried extras+best_params, extras, {} but never best_params
    alone, so every attempt structure-mismatched)."""
    from gn_ode_sir_tpu.sim import sir_classical

    g = random_graph
    rng = np.random.default_rng(3)
    N, T = 8, 8
    seed_sets, betas, gammas, triples = [], [], [], []
    for _ in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        b, gm = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, b, gm, max_time=T)
        seed_sets.append(list(seeds)); betas.append(b); gammas.append(gm)
        triples.append((s_t, i_t, r_t))
    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    ckpt = str(tmp_path / "ck")

    params = model.init(jax.random.PRNGKey(0))
    fit(model, opt, params, data, tr, va, te, lambda gi: adj,
        epochs=3, batch_size=4, verbose=False, checkpoint_dir=ckpt)
    res = fit(model, opt, params, data, tr, va, te, lambda gi: adj,
              epochs=5, batch_size=4, verbose=False,
              checkpoint_dir=ckpt, resume=True, track_test_per_trial=True)
    assert res.history[0][0] == 3
    assert res.test_loss_all is not None
    assert len(res.test_loss_all) == len(te)


def test_csv_sink_schema(tmp_path):
    from gn_ode_sir_tpu.utils import csv_trials, save_trial_to_csv
    from gn_ode_sir_tpu.utils.config import ExperimentConfig
    from gn_ode_sir_tpu.utils.csvsink import TRIAL_COLUMNS

    cfg = ExperimentConfig(
        path_to_save=str(tmp_path), beta=[0.2], gamma=[0.1], i_indices=[[1, 2]]
    )
    save_trial_to_csv(cfg, "karate", 3, 0.1, 0.12, 0.2, 0.5, 0.1)
    save_trial_to_csv(cfg, "karate", 4, 0.2, 0.22, 0.2, 0.5, 0.1)
    import csv as csvmod

    with open(os.path.join(str(tmp_path), "Metrics-trials-karate")) as f:
        rows = list(csvmod.reader(f))
    assert rows[0] == TRIAL_COLUMNS
    assert len(rows) == 3


def test_make_out_of_dist_split_semantics():
    from gn_ode_sir_tpu.train import make_out_of_dist_split

    rng = np.random.default_rng(0)
    gammas = rng.uniform(0.1, 0.5, 200)
    d = make_out_of_dist_split(gammas, n_train=80, n_val=40, seed=1)
    assert len(d["train"]) == 80 and len(d["val"]) == 40 and len(d["test"]) == 80
    assert not (d["train"] & d["val"]) and not (d["train"] & d["test"])
    # train gammas confined to the middle histogram bins
    _, bins = np.histogram(gammas, bins=4)
    tr = np.array(sorted(d["train"]))
    assert gammas[tr].min() >= bins[1] and gammas[tr].max() < bins[3]
    # fixture schema
    assert set(d) == {"train", "val", "test", "test-in-dist", "counts", "bins"}
    assert d["test-in-dist"] <= d["test"]


def test_out_of_dist_split(karate_fixture_dir):
    from gn_ode_sir_tpu.train import out_of_dist_split

    path = os.path.join(karate_fixture_dir, "out-of-dist-gamma.pkl")
    if not os.path.exists(path):
        pytest.skip("no out-of-dist fixture")
    d = out_of_dist_split(path)
    assert len(d["train"]) > 0 and len(d["val"]) > 0
    assert set(d["train"]).isdisjoint(set(d["val"]))


def test_resume_reproduces_uninterrupted_trace(random_graph, tmp_path):
    """Crash+resume must reproduce the UNINTERRUPTED run's training trace
    and final losses exactly: restored opt state is exact and the batch-
    shuffle rng fast-forwards to the resume epoch."""
    from gn_ode_sir_tpu.sim import sir_classical

    g = random_graph
    rng = np.random.default_rng(2)
    N, T = 10, 8
    seed_sets, betas, gammas, triples = [], [], [], []
    for _ in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        b, gm = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, b, gm, max_time=T)
        seed_sets.append(list(seeds)); betas.append(b); gammas.append(gm)
        triples.append((s_t, i_t, r_t))
    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-2)
    params = model.init(jax.random.PRNGKey(0))

    full = fit(model, opt, params, data, tr, va, te, lambda gi: adj,
               epochs=8, batch_size=4, verbose=False)

    ckpt = str(tmp_path / "ck")
    fit(model, opt, params, data, tr, va, te, lambda gi: adj,
        epochs=4, batch_size=4, verbose=False,
        checkpoint_dir=ckpt, checkpoint_every=2)
    resumed = fit(model, opt, params, data, tr, va, te, lambda gi: adj,
                  epochs=8, batch_size=4, verbose=False,
                  checkpoint_dir=ckpt, resume=True)

    # epochs 4..7 of the resumed run equal the uninterrupted run's
    np.testing.assert_allclose(
        [h[1] for h in resumed.history], [h[1] for h in full.history[4:]],
        rtol=1e-6)
    np.testing.assert_allclose(resumed.test_loss, full.test_loss, rtol=1e-6)
    assert resumed.best_epoch == full.best_epoch


def test_auto_checkpoint_gating(random_graph, tmp_path):
    """checkpoint_auto_s arms checkpointing ONLY for runs projected past the
    threshold: a short run leaves the dir empty (no Orbax write through the
    tunnel), a run projected long turns on the cadence and writes, and an
    explicit checkpoint_dir WITHOUT auto keeps the unconditional final save
    (the resume contract, test_fit_checkpoint_resume)."""
    from gn_ode_sir_tpu.sim import sir_classical

    g = random_graph
    rng = np.random.default_rng(2)
    N, T = 6, 6
    seed_sets, betas, gammas, triples = [], [], [], []
    for _ in range(N):
        seeds = rng.choice(g.n_nodes, 2, replace=False)
        b, gm = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        i_t, s_t, r_t = sir_classical(g, seeds, b, gm, max_time=T)
        seed_sets.append(list(seeds)); betas.append(b); gammas.append(gm)
        triples.append((s_t, i_t, r_t))
    data = build_trial_data(g.n_nodes, seed_sets, betas, gammas, triples)
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    adj = adjacency_from_graph(g)
    params = model.init(jax.random.PRNGKey(0))

    short = str(tmp_path / "short")
    fit(model, optax.adam(1e-2), params, data, tr, va, te, lambda gi: adj,
        epochs=6, batch_size=4, verbose=False,
        checkpoint_dir=short, checkpoint_auto_s=1e9)
    assert not os.path.exists(short) or not os.listdir(short)

    long_ = str(tmp_path / "long")
    fit(model, optax.adam(1e-2), params, data, tr, va, te, lambda gi: adj,
        epochs=6, batch_size=4, verbose=False,
        checkpoint_dir=long_, checkpoint_auto_s=1e-6)
    assert os.path.exists(long_) and os.listdir(long_)


def test_fit_best_params_are_best_val_epoch_weights(random_graph):
    """FitResult.best_params must be the weights of the best-val epoch —
    re-evaluating them on the val split reproduces best_val_loss exactly,
    and when the best epoch is not the last one they differ from the
    final-epoch params (the serving checkpoint must not ship an overfit
    tail model labeled 'best')."""
    from gn_ode_sir_tpu.sim import sir_classical
    from gn_ode_sir_tpu.train.loop import make_eval_fn, _data_to_device
    from gn_ode_sir_tpu.train.data import epoch_batches as _eb

    g = random_graph
    rng = np.random.default_rng(1)
    N, T = 12, 10
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
    tr, va, te = split_indices(N, (0.6, 0.2, 0.2))
    model = GNODE(hidden=8, max_time=T)
    adj = adjacency_from_graph(g)
    # high lr so the val curve is non-monotone and the best epoch is
    # (virtually always) not the final one
    res = fit(model, optax.adam(0.2), model.init(jax.random.PRNGKey(0)),
              data, tr, va, te, lambda gi: adj,
              epochs=10, batch_size=4, verbose=False)
    assert res.best_params is not None
    evaluate = make_eval_fn(model, lambda gi: adj)
    d = _data_to_device(data)
    val_bi, val_bw = _eb(len(va), 8, None)
    val_bi = np.asarray(va, np.int32)[val_bi]
    best_val_again = float(evaluate(res.best_params, d, val_bi, val_bw))
    np.testing.assert_allclose(best_val_again, res.best_val_loss, rtol=1e-6)
    if res.best_epoch != res.history[-1][0]:
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree_util.tree_leaves(res.best_params),
                            jax.tree_util.tree_leaves(res.params))
        ]
        assert max(diffs) > 0
