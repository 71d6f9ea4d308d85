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


def test_golden_vs_reference_karate_labels(karate, karate_fixture_dir):
    """Distributional regression against the shipped 10k-sim fixtures.

    Both estimators target the same mean field; with 10k+10k sims the
    difference should be within a few MC standard errors (~0.005 * 3).
    """
    with open(os.path.join(karate_fixture_dir, "initial-seed.pkl"), "rb") as f:
        seeds_all = pickle.load(f)
    with open(os.path.join(karate_fixture_dir, "initial-beta.pkl"), "rb") as f:
        betas = pickle.load(f)
    with open(os.path.join(karate_fixture_dir, "initial-gamma.pkl"), "rb") as f:
        gammas = pickle.load(f)

    checked = 0
    for k in range(len(seeds_all)):
        ref = load_labels(karate_fixture_dir, "karate", seeds_all[k], sim=10000)
        if ref is None:
            continue
        s, i, r = simulate_sir(
            karate, seeds_all[k], betas[k], gammas[k], sims=10000,
            key=jax.random.PRNGKey(100 + k),
        )
        for ours, theirs in zip((s, i, r), ref):
            assert np.abs(ours - theirs).mean() < 0.01, (
                f"trial {k}: mean deviation {np.abs(ours - theirs).mean():.4f}"
            )
            assert np.abs(ours - theirs).max() < 0.06
        checked += 1
        if checked >= 3:
            break
    assert checked >= 1, "no cached fixture trials found"
