"""Monte-Carlo simulator tests: property-based + golden regression against
the reference's shipped karate label pickles (SURVEY.md §4 strategy)."""

import os
import pickle

import jax
import numpy as np
import pytest

from gn_ode_sir_tpu.sim import simulate_sir
from gn_ode_sir_tpu.utils import load_labels


def test_probability_conservation(karate):
    s, i, r = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=500, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(s + i + r, 1.0, atol=1e-9)


def test_monotone_recovered(karate):
    s, i, r = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=500, key=jax.random.PRNGKey(1))
    assert np.all(np.diff(r, axis=0) >= -1e-12), "R must be non-decreasing"
    assert np.all(np.diff(s, axis=0) <= 1e-12), "S must be non-increasing"


def test_beta_zero_no_spread(karate):
    seeds = [3, 7]
    s, i, r = simulate_sir(karate, seeds, 0.0, 0.3, sims=300, key=jax.random.PRNGKey(2))
    non_seed = np.setdiff1d(np.arange(karate.n_nodes), seeds)
    assert np.all(i[:, non_seed] == 0.0)
    assert np.all(r[:, non_seed] == 0.0)
    # seeds decay towards recovered
    assert r[-1, seeds].mean() > 0.9


def test_gamma_zero_no_recovery(karate):
    s, i, r = simulate_sir(karate, [0], 0.4, 0.0, sims=300, key=jax.random.PRNGKey(3))
    assert np.all(r == 0.0)


def test_initial_condition(karate):
    seeds = [1, 4]
    s, i, r = simulate_sir(karate, seeds, 0.3, 0.2, sims=100, key=jax.random.PRNGKey(4))
    expect_i0 = np.zeros(karate.n_nodes)
    expect_i0[seeds] = 1
    np.testing.assert_allclose(i[0], expect_i0)
    np.testing.assert_allclose(s[0], 1 - expect_i0)
    np.testing.assert_allclose(r[0], 0)


def test_sims_chunking_equivalence(karate):
    """Chunked and unchunked runs estimate the same process (MC tolerance)."""
    a = simulate_sir(karate, [0], 0.3, 0.2, sims=4000, key=jax.random.PRNGKey(5))
    b = simulate_sir(karate, [0], 0.3, 0.2, sims=4000, key=jax.random.PRNGKey(6), sims_chunk=1000)
    assert np.abs(a[1] - b[1]).mean() < 0.03


def test_golden_vs_reference_karate_labels_all_trials(karate, karate_fixture_dir):
    """Z-scored equivalence against ALL shipped 10k-sim fixture triples.

    Both estimators target the same per-node probability p; the difference
    of two independent 10k-sim estimates has sd sqrt(2 p(1-p)/10k) per
    point. With the pooled p-hat as the plug-in, per-point z-scores must
    look standard-normal-ish: per-trial mean |z| below 1.2 (N(0,1) expects
    0.798; exact-agreement points at deterministic nodes push it lower) and
    a global max |z| < 8 over the ~3.6M points (the N(0,1) max over that
    many draws is ~5.3; binomial tails at small p are slightly heavier).
    A systematic simulator bias of even 2e-3 at p~0.5 would shift z by ~0.3
    per point and blow the mean-|z| gate across 177 trials.
    """
    sims = 10000
    with open(os.path.join(karate_fixture_dir, "initial-seed.pkl"), "rb") as f:
        seeds_all = pickle.load(f)
    with open(os.path.join(karate_fixture_dir, "initial-beta.pkl"), "rb") as f:
        betas = pickle.load(f)
    with open(os.path.join(karate_fixture_dir, "initial-gamma.pkl"), "rb") as f:
        gammas = pickle.load(f)

    checked = 0
    max_z_global = 0.0
    mean_abs_z = []
    seen_seed_sets = set()
    for k in range(len(seeds_all)):
        # The reference cache is keyed by seed set only, so trials sharing a
        # seed set COLLIDE: the shipped file holds the FIRST such trial's
        # labels (23 of 200 shipped trials collide; DEVIATIONS.md #4a).
        # Compare each unique file against the params that generated it.
        tag = tuple(seeds_all[k])
        if tag in seen_seed_sets:
            continue
        seen_seed_sets.add(tag)
        ref = load_labels(karate_fixture_dir, "karate", seeds_all[k], sim=sims)
        if ref is None:
            continue
        s, i, r = simulate_sir(
            karate, seeds_all[k], betas[k], gammas[k], sims=sims,
            key=jax.random.PRNGKey(100 + k),
        )
        ours = np.stack([s, i, r])
        theirs = np.stack(ref)
        diff = ours - theirs
        pooled = np.clip((ours + theirs) / 2, 0.5 / sims, 1 - 0.5 / sims)
        sigma = np.sqrt(2.0 * pooled * (1.0 - pooled) / sims)
        z = np.abs(diff) / sigma
        max_z_global = max(max_z_global, float(z.max()))
        mean_abs_z.append(float(z.mean()))
        assert z.mean() < 1.2, f"trial {k}: mean |z| {z.mean():.3f}"
        assert np.abs(diff).mean() < 0.01, (
            f"trial {k}: mean deviation {np.abs(diff).mean():.4f}"
        )
        checked += 1
    assert checked >= 170, f"expected the full shipped fixture set, got {checked}"
    assert max_z_global < 8.0, f"global max |z| {max_z_global:.2f}"
    # no systematic bias: averaged over all trials, |z| must sit near the
    # noise-floor expectation, not above it
    assert float(np.mean(mean_abs_z)) < 1.0


def test_high_sims_self_convergence(karate):
    """The estimator's own SE shrinks as 1/sqrt(sims) toward the 1e-4 scale.

    Two INDEPENDENT estimates at 500k sims must agree ~7x tighter than two
    at 10k sims (sqrt(50) = 7.07), and their mean deviation must land at the
    1e-3..1e-4 scale — the empirical demonstration behind the north-star
    argument (RESULTS.md fidelity section) that the 1e-4 L1 target is the MC
    noise floor, approachable only by raising sims, not by any
    reimplementation at 10k.
    """
    beta, gamma, seeds = 0.3, 0.2, [0, 5]

    def pair_mad(sims, chunk, k1, k2):
        a = simulate_sir(karate, seeds, beta, gamma, sims=sims,
                         sims_chunk=chunk, key=jax.random.PRNGKey(k1))
        b = simulate_sir(karate, seeds, beta, gamma, sims=sims,
                         sims_chunk=chunk, key=jax.random.PRNGKey(k2))
        return float(np.abs(np.stack(a) - np.stack(b)).mean())

    mad_10k = pair_mad(10_000, None, 11, 22)
    mad_500k = pair_mad(500_000, 100_000, 33, 44)
    assert mad_500k < mad_10k / 3.0, (mad_10k, mad_500k)
    assert mad_500k < 2e-3, mad_500k


def test_per_sim_matches_counts(karate):
    """simulate_sir_per_sim keeps full per-simulation indicator trajectories
    (the sir_pandas capability, ode_nn.py:104-106); with the same key it runs
    the IDENTICAL trajectories as the counts path, so indicator sums must
    match exactly."""
    from gn_ode_sir_tpu.sim import simulate_sir_counts, simulate_sir_per_sim

    key = jax.random.PRNGKey(12)
    s, i, r = simulate_sir_per_sim(karate, [2, 9], 0.35, 0.25, sims=400,
                                   max_time=12, key=key)
    assert s.shape == (400, 12, karate.n_nodes)
    # indicators are {0,1} and partition states
    assert set(np.unique(s)) <= {0, 1}
    np.testing.assert_array_equal(s + i + r, np.ones_like(s))
    sums = np.asarray(simulate_sir_counts(karate, [2, 9], 0.35, 0.25, sims=400,
                                          max_time=12, key=key))
    np.testing.assert_array_equal(s.sum(0), sums[:, 0])
    np.testing.assert_array_equal(i.sum(0), sums[:, 1])
    np.testing.assert_array_equal(r.sum(0), sums[:, 2])


def test_rbg16_coins_deterministic_and_unbiased(karate):
    """The rbg16 coin mode (XLA RngBitGenerator, the TPU 'auto' pick) must be
    (a) deterministic per key and (b) statistically interchangeable with the
    threefry bits16 stream — same process, different unbiased generator."""
    k = jax.random.PRNGKey(7)
    a = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=4000, key=k, coins="rbg16")
    b = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=4000, key=k, coins="rbg16")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=4000, key=k, coins="bits16")
    # two independent 4k-sim estimates of the same process: MC-noise close
    assert np.abs(np.stack(a) - np.stack(c)).mean() < 0.02


def test_counts_s_channel_implied_exactly(karate):
    """simulate_sir_counts returns [T, 3, n] f32 with S + I + R == sims at
    every (t, node) — the S row is reconstructed from the partition identity,
    not reduced on device."""
    from gn_ode_sir_tpu.sim import simulate_sir_counts

    sums = np.asarray(simulate_sir_counts(
        karate, [0], 0.3, 0.2, sims=700, max_time=10,
        key=jax.random.PRNGKey(9)))
    assert sums.shape == (10, 3, karate.n_nodes)
    assert sums.dtype == np.float32
    np.testing.assert_array_equal(sums.sum(1), np.full_like(sums[:, 0], 700.0))
    assert np.all(sums >= 0)


def test_batched_trials_bit_identical_to_sequential(karate):
    """The vmapped multi-trial program must reproduce the single-trial
    results BIT-IDENTICALLY per trial under threefry coins (same per-trial
    key -> same stream; the batched matmul stays exact integer counts),
    including across the padded final chunk."""
    from gn_ode_sir_tpu.sim import simulate_sir_counts, simulate_sir_counts_many

    trials = [([0, 5], 0.3, 0.2), ([3], 0.45, 0.1), ([7, 9, 11], 0.2, 0.3)]
    keys = [jax.random.PRNGKey(100 + j) for j in range(3)]
    batched = simulate_sir_counts_many(
        karate, trials, sims=600, max_time=12, keys=keys,
        trials_chunk=2,  # 3 trials -> one full chunk + one PADDED chunk
        coins="bits16", matmul="bf16",
    )
    for j, (sn, b, g) in enumerate(trials):
        solo = simulate_sir_counts(
            karate, sn, b, g, sims=600, max_time=12, key=keys[j],
            coins="bits16", matmul="bf16",
        )
        np.testing.assert_array_equal(np.asarray(batched[j]), np.asarray(solo))


def test_batched_trials_pallas_coins_fall_back_sequential(karate, monkeypatch):
    """``coins='pallas'`` has no vmapped batched-trials program; the batched
    entry point must route each trial through the single-trial simulator
    (regression: it used to raise, crashing every extraction under
    ``--coins pallas`` since the worker batches all misses)."""
    from gn_ode_sir_tpu.sim import mc_sir

    calls = []

    def fake_counts(graph, sn, b, g, **kw):
        calls.append((tuple(sn), b, g, kw.get("coins"), kw.get("key") is not None))
        return np.zeros((5, 3, graph.n_nodes), np.float32)

    monkeypatch.setattr(mc_sir, "simulate_sir_counts", fake_counts)
    trials = [([0, 5], 0.3, 0.2), ([3], 0.45, 0.1), ([7], 0.2, 0.3)]
    out = mc_sir.simulate_sir_counts_many(
        karate, trials, sims=16, max_time=5, coins="pallas"
    )
    assert len(out) == len(trials) and len(calls) == len(trials)
    assert all(c[3] == "pallas" and c[4] for c in calls)


def test_load_or_extract_labels_many_cache(karate, tmp_path):
    """Batched extraction writes the same exact-keyed pickles the sequential
    path does, and a second call is served fully from cache."""
    from gn_ode_sir_tpu.utils import load_or_extract_labels, load_or_extract_labels_many

    trials = [([0, 5], 0.3, 0.2), ([3], 0.45, 0.1)]
    keys = [jax.random.PRNGKey(100 + j) for j in range(2)]
    d_many = tmp_path / "many"
    d_solo = tmp_path / "solo"
    got = load_or_extract_labels_many(
        karate, trials, sim=400, max_time=8, save_dir=str(d_many), keys=keys,
    )
    solo = [
        load_or_extract_labels(
            karate, sn, b, g, sim=400, max_time=8, save_dir=str(d_solo),
            key=keys[j],
        )
        for j, (sn, b, g) in enumerate(trials)
    ]
    for a, b in zip(got, solo):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert sorted(os.listdir(d_many)) == sorted(os.listdir(d_solo))
    again = load_or_extract_labels_many(
        karate, trials, sim=400, max_time=8, save_dir=str(d_many), keys=keys,
    )
    for a, b in zip(got, again):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_int8_matmul_mode_bit_identical(karate):
    """The int8 MXU counts path (s8 x s8 -> s32) must produce BIT-IDENTICAL
    labels to the bf16 path: indicator x {0,1}-adjacency products and their
    small-integer sums are exact in both dtypes, so the same coin stream
    yields the same trajectories."""
    import jax

    from gn_ode_sir_tpu.sim import simulate_sir

    k = jax.random.PRNGKey(11)
    s1, i1, r1 = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=1500, key=k,
                              matmul="bf16")
    s2, i2, r2 = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=1500, key=k,
                              matmul="int8")
    for a, b in ((s1, s2), (i1, i2), (r1, r2)):
        np.testing.assert_array_equal(a, b)


def test_typed_prng_key_accepted_and_matches_raw(karate):
    """New-style typed keys (jax.random.key) must work on every public sim
    entry point and reproduce the legacy raw-key stream — the rbg16 coin
    path re-wraps raw uint32 words, so typed keys are normalized up front
    (mc_sir._raw_key)."""
    import jax

    from gn_ode_sir_tpu.sim import simulate_sir
    from gn_ode_sir_tpu.sim.mc_sir import _raw_key, simulate_sir_per_sim

    a = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=300,
                     key=jax.random.key(7))
    b = simulate_sir(karate, [0, 5], 0.3, 0.2, sims=300,
                     key=jax.random.PRNGKey(7))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    pa = simulate_sir_per_sim(karate, [1], 0.3, 0.2, sims=50, max_time=6,
                              key=jax.random.key(3))
    pb = simulate_sir_per_sim(karate, [1], 0.3, 0.2, sims=50, max_time=6,
                              key=jax.random.PRNGKey(3))
    for x, y in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    with pytest.raises(ValueError):
        _raw_key(np.zeros((2, 2), np.uint32))


def test_batched_trials_typed_keys(karate):
    """simulate_sir_counts_many normalizes a per-trial typed-key list."""
    import jax

    from gn_ode_sir_tpu.sim.mc_sir import simulate_sir_counts_many

    trials = [([0], 0.3, 0.2), ([1, 2], 0.4, 0.1)]
    kt = [jax.random.key(10), jax.random.key(11)]
    kr = [jax.random.PRNGKey(10), jax.random.PRNGKey(11)]
    got_t = simulate_sir_counts_many(karate, trials, sims=200, max_time=6,
                                     keys=kt)
    got_r = simulate_sir_counts_many(karate, trials, sims=200, max_time=6,
                                     keys=kr)
    for a, b in zip(got_t, got_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_sim_knob_parity_with_counts(karate):
    """The per-sim path takes the counts path's full knob surface (VERDICT
    r3 missing #2): int8 matmul + state carry is bit-identical to bf16,
    sims_chunk draws the chunked counts path's streams, and the stats helper
    covers the sir_pandas variance-over-sims analysis (ode_nn.py:104-106)."""
    from gn_ode_sir_tpu.sim import simulate_sir_counts, simulate_sir_per_sim
    from gn_ode_sir_tpu.sim.mc_sir import sir_per_sim_stats

    key = jax.random.PRNGKey(3)
    kw = dict(sims=200, max_time=10, key=key, coins="bits16")
    a = simulate_sir_per_sim(karate, [4, 7], 0.3, 0.2, matmul="bf16", **kw)
    b = simulate_sir_per_sim(karate, [4, 7], 0.3, 0.2, matmul="int8", **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # chunked per-sim == chunked counts (same per-chunk key schedule)
    sc, ic, rc = simulate_sir_per_sim(karate, [4, 7], 0.3, 0.2, sims_chunk=64,
                                      matmul="bf16", **kw)
    assert sc.shape[0] == 200
    sums = np.asarray(simulate_sir_counts(karate, [4, 7], 0.3, 0.2,
                                          sims_chunk=64, matmul="bf16", **kw))
    np.testing.assert_array_equal(ic.sum(0), sums[:, 1])
    np.testing.assert_array_equal(rc.sum(0), sums[:, 2])

    # rbg16 runs through the per-sim path and stays a valid indicator process
    sr, ir, rr = simulate_sir_per_sim(karate, [4, 7], 0.3, 0.2, sims=200,
                                      max_time=10, key=key, coins="rbg16")
    np.testing.assert_array_equal(sr + ir + rr, np.ones_like(sr))

    stats = sir_per_sim_stats(*a)
    assert stats["mean"].shape == (3, 10, karate.n_nodes)
    # Bernoulli moment identity: var = p(1-p) over sims, exact per node/time
    p = stats["mean"][1]
    np.testing.assert_allclose(stats["std"][1] ** 2, p * (1 - p), atol=1e-9)
