"""The shipped examples must actually run (README promises them)."""

import importlib.util
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KARATE = "/root/reference/real_graphs/karate"


def _load_module(path):
    spec = importlib.util.spec_from_file_location("quickstart_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_example_end_to_end():
    if not os.path.exists(KARATE + ".pkl"):
        import pytest

        pytest.skip("reference graph pickles not mounted")
    qs = _load_module(os.path.join(ROOT, "examples", "quickstart.py"))
    mae = qs.main(KARATE, trials=6, sims=200, epochs=4, hidden=8,
                  max_time=10, verbose=False)
    assert np.isfinite(mae)
    assert mae < 0.6  # softmax outputs are probabilities; random is ~0.5
