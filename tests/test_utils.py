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
    # second call must hit the cache (byte-identical)
    s2, i2, r2 = load_or_extract_labels(
        karate, [0, 5], 0.9, 0.9, sim=200, max_time=8,  # params ignored on hit
        save_dir=str(tmp_path), key=jax.random.PRNGKey(99),
    )
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(i1, i2)


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
