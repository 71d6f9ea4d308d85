"""Utils-layer tests: label cache conventions, config roundtrip, metrics."""

import os
import pickle

import numpy as np
import pytest

from gn_ode_sir_tpu.utils import (
    MetricsLogger,
    label_paths,
    load_labels,
    load_or_extract_labels,
)
from gn_ode_sir_tpu.utils.config import ExperimentConfig


def test_label_paths_reference_naming(tmp_path):
    paths = label_paths(str(tmp_path), "karate", [25, 18])
    assert paths["S"].endswith("karate-S-25-18.pkl")
    assert paths["I"].endswith("karate-I-25-18.pkl")


def test_load_labels_counts_autodetect(tmp_path):
    """wiki-vote/enron convention: stored as raw counts, divided by sim at
    load (ode_nn_ngraphs.py:168-171)."""
    probs = np.random.default_rng(0).random((5, 7))
    counts = probs * 1000
    for c, arr in zip(("S", "I", "R"), (probs, counts, probs)):
        with open(tmp_path / f"g-{c}-1-2.pkl", "wb") as f:
            pickle.dump(arr, f)
    s, i, r = load_labels(str(tmp_path), "g", [1, 2], sim=1000)
    np.testing.assert_allclose(s, probs)
    np.testing.assert_allclose(i, probs)  # counts divided by sim
    # counts without sim -> explicit error
    with pytest.raises(ValueError):
        load_labels(str(tmp_path), "g", [1, 2], sim=None)


def test_load_or_extract_roundtrip(tmp_path, karate):
    import jax

    s1, i1, r1 = load_or_extract_labels(
        karate, [0, 5], 0.3, 0.2, sim=200, max_time=8,
        save_dir=str(tmp_path), key=jax.random.PRNGKey(0),
    )
    # same params -> cache hit (byte-identical even with a different key)
    s2, i2, r2 = load_or_extract_labels(
        karate, [0, 5], 0.3, 0.2, sim=200, max_time=8,
        save_dir=str(tmp_path), key=jax.random.PRNGKey(99),
    )
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(i1, i2)
    # same seed set, different (beta, gamma) -> NO collision (the reference's
    # seeds-only key would silently serve the 0.3/0.2 labels here;
    # DEVIATIONS.md #15)
    s3, i3, r3 = load_or_extract_labels(
        karate, [0, 5], 0.45, 0.4, sim=200, max_time=8,
        save_dir=str(tmp_path), key=jax.random.PRNGKey(0),
    )
    assert np.abs(i3 - i1).max() > 0.01


def test_extract_many_chunked_default_keys_are_distinct(karate):
    """The sims_chunk (huge-graph) path with keys=None must give every
    cache-miss trial its OWN stream, like the batched path's
    fold_in(key0, 1000+pos) default — it used to hand every trial
    simulate_sir's PRNGKey(0), so two trials with identical (seeds, beta,
    gamma) drew bit-identical 'independent' labels."""
    from gn_ode_sir_tpu.utils.labels import load_or_extract_labels_many

    trials = [([0, 5], 0.3, 0.2), ([0, 5], 0.3, 0.2)]
    out = load_or_extract_labels_many(
        karate, trials, sim=400, max_time=8, save_dir=None, sims_chunk=100,
    )
    assert np.abs(np.asarray(out[0][1]) - np.asarray(out[1][1])).max() > 0, (
        "identical trials must draw independent MC streams"
    )
    # and the defaulting is deterministic across calls
    out2 = load_or_extract_labels_many(
        karate, trials, sim=400, max_time=8, save_dir=None, sims_chunk=100,
    )
    np.testing.assert_array_equal(np.asarray(out[0][1]),
                                  np.asarray(out2[0][1]))


def test_legacy_seeds_only_labels_still_load(tmp_path, karate):
    """Reference-layout (seeds-only-named) caches remain readable."""
    import pickle

    import jax

    from gn_ode_sir_tpu.utils.labels import label_paths

    s1, i1, r1 = load_or_extract_labels(
        karate, [1, 4], 0.3, 0.2, sim=100, max_time=6,
        save_dir=None, key=jax.random.PRNGKey(1),
    )
    legacy = label_paths(str(tmp_path), karate.name, [1, 4])  # no beta/gamma
    for c, arr in zip(("S", "I", "R"), (s1, i1, r1)):
        with open(legacy[c], "wb") as f:
            pickle.dump(arr, f)
    out = load_or_extract_labels(
        karate, [1, 4], 0.77, 0.66, sim=100, max_time=6,  # reference semantics:
        save_dir=str(tmp_path), key=jax.random.PRNGKey(2),  # seeds-only hit wins
    )
    np.testing.assert_array_equal(out[1], i1)


def test_config_json_roundtrip():
    cfg = ExperimentConfig(model="GCN", hidden=16, beta=[0.2, 0.3], i_indices=[[1, 2]])
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.model == "GCN" and cfg2.hidden == 16
    assert list(cfg2.beta) == [0.2, 0.3]


def test_metrics_logger(tmp_path):
    ml = MetricsLogger(str(tmp_path / "m.jsonl"))
    ml.log(epoch=0, loss=1.5)
    ml.log(epoch=1, loss=1.2)
    rows = ml.read()
    assert len(rows) == 2 and rows[1]["loss"] == 1.2
    assert "wall_s" in rows[0]


def test_roofline_models():
    """Roofline models: dominant-term counts and utilization arithmetic."""
    from gn_ode_sir_tpu.utils.roofline import (
        V5E_PEAKS,
        gnode_train_epoch_model,
        mc_sim_model,
        spmm_apply_model,
        utilization,
    )

    m = mc_sim_model(n_nodes=2905, sims=10_000, max_time=20)
    # 19 steps x 2 * 1e4 * 2905^2 int ops
    assert abs(m["ops"] - 19 * 2 * 1e4 * 2905**2) < 1e6
    u = utilization(m, wall_s=0.1)
    assert 0 < u["mfu"] < 1 and u["achieved_tops"] > 0
    assert u["peaks_for"] == V5E_PEAKS["name"]

    t = gnode_train_epoch_model(7066, 64, 1, 120, 40)
    # matvec dominates: 3x fwd of 40 evals x 2*n^2*h x 120 steps, within 10%
    assert t["ops"] == pytest.approx(3 * 40 * 2 * 7066**2 * 64 * 120, rel=0.1)

    s = spmm_apply_model(7066, 201_472, 64)
    assert s["bytes"] > s["ops"]  # gather-bound: bytes dominate flops
    u2 = utilization(s, wall_s=1.68e-3)
    assert 0 < u2["hbm_frac"] < 1

    from gn_ode_sir_tpu.utils.roofline import mg_train_epoch_model

    # enron-protocol shapes: 23 grouped steps split over 5 train graphs
    g = mg_train_epoch_model(33696, 8, 8, [(5, 361_622), (18, 40_000)], 40)
    assert g["ops"] > 0 and g["bytes"] > 0
    # h=8 sparse path is gather/traffic-bound, not FLOP-bound
    assert g["bytes"] > g["ops"] / 100
    # more steps on the big graph strictly increases both terms
    g2 = mg_train_epoch_model(33696, 8, 8, [(6, 361_622), (18, 40_000)], 40)
    assert g2["ops"] > g["ops"] and g2["bytes"] > g["bytes"]


def test_coin_mode_sidecar(tmp_path, karate, capsys):
    """Label extraction records the RESOLVED coin mode next to the cache;
    a later extraction with a different mode warns (rbg16 reruns are
    batch-composition-dependent — ADVICE r3: flag mixed-stream caches)."""
    import json

    from gn_ode_sir_tpu.utils import load_or_extract_labels

    d = str(tmp_path / "cache")
    load_or_extract_labels(karate, [0, 5], 0.3, 0.2, sim=50, max_time=6,
                           save_dir=d, coins="bits16")
    meta = json.load(open(f"{d}/coins-mode.json"))
    assert meta["coins"] == "bits16"

    # same mode again: no warning, meta unchanged
    capsys.readouterr()
    load_or_extract_labels(karate, [1, 6], 0.3, 0.2, sim=50, max_time=6,
                           save_dir=d, coins="bits16")
    assert "WARNING" not in capsys.readouterr().out
    assert json.load(open(f"{d}/coins-mode.json"))["coins"] == "bits16"

    # different mode: loud warning, original record kept
    load_or_extract_labels(karate, [2, 7], 0.3, 0.2, sim=50, max_time=6,
                           save_dir=d, coins="bits32")
    out = capsys.readouterr().out
    assert "WARNING" in out and "bits32" in out
    assert json.load(open(f"{d}/coins-mode.json"))["coins"] == "bits16"


def test_persistent_compilation_cache(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache points XLA compiles at an on-disk
    cache (fresh matrix processes then deserialize instead of re-compiling —
    the reference has no analogue because eager torch never compiles), and
    GN_JAX_CACHE=0 disables it. Config is restored so other tests see the
    session default."""
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    monkeypatch.setenv("GN_JAX_CACHE", "0")
    assert enable_persistent_compilation_cache(str(tmp_path / "c0")) is None

    monkeypatch.delenv("GN_JAX_CACHE", raising=False)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        d = enable_persistent_compilation_cache(
            str(tmp_path / "cache"), min_compile_time_secs=0.0
        )
        assert d == str(tmp_path / "cache")

        @jax.jit
        def f(x):
            return jnp.sin(x) @ jnp.cos(x).T

        f(jnp.ones((64, 64))).block_until_ready()
        entries = list((tmp_path / "cache").iterdir())
        assert entries, "no cache entry persisted"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prev_size
        )
        # un-pin the cache object so later compiles don't write into the
        # deleted tmp dir (jax memoizes it at first use; see compile_cache.py)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()


def test_timer_and_timed_block_on_device_work():
    """`Timer` / `timed` must synchronize on the device result before
    stopping the clock (the reference times async launches with bare
    time.time(), `ode_nn_ngraph_sim.py:224-228` — on TPU that measures
    dispatch, not compute)."""
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.utils import Timer
    from gn_ode_sir_tpu.utils.timing import timed

    x = jnp.ones((128, 128))
    with Timer() as t:
        y = t.block_on(x @ x)
    assert t.seconds > 0.0
    np.testing.assert_allclose(np.asarray(y)[0, 0], 128.0)

    out, secs = timed(lambda a: a @ a, x)
    assert secs > 0.0
    np.testing.assert_allclose(np.asarray(out)[0, 0], 128.0)
    # block_on=None path: plain wall clock, no sync
    with Timer() as t2:
        pass
    assert t2.seconds >= 0.0


def test_device_memory_stats_shape():
    """Returns a plain dict (may be empty on backends without memory_stats
    — the CPU test backend is allowed either way)."""
    from gn_ode_sir_tpu.utils import device_memory_stats

    stats = device_memory_stats()
    assert isinstance(stats, dict)
