"""Legacy transductive node-split protocol tests (reference ode_nn.py path)."""

import jax
import numpy as np
import optax

from gn_ode_sir_tpu.models.gnode import legacy_dense_gnode
from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
from gn_ode_sir_tpu.train.node_split import fit_node_split, node_split_indices


def test_node_split_reference_permutation():
    """Must reproduce np.random.RandomState(42).permutation (ode_nn.py:418)."""
    tr, va, te = node_split_indices(34, (0.6, 0.2, 0.2))
    expect = np.random.RandomState(seed=42).permutation(34)
    np.testing.assert_array_equal(np.concatenate([tr, va, te]), expect)
    # int-floor boundaries: int(.6*34)=20, int(.8*34)=27
    assert len(tr) == 20 and len(va) == 7 and len(te) == 7


def test_fit_node_split(karate):
    from gn_ode_sir_tpu.sim import sir_classical

    g = karate
    seeds = [12]
    beta, gamma = 0.2, 0.1
    i_t, s_t, r_t = sir_classical(g, seeds, beta, gamma, max_time=10)
    labels = np.stack([s_t, i_t, r_t], -1)  # smooth fittable target

    i0 = np.zeros(g.n_nodes, np.float32)
    i0[seeds] = 1
    model = legacy_dense_gnode(hidden=8, max_time=10)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    tr, va, te = node_split_indices(g.n_nodes)
    res = fit_node_split(
        model, optax.adam(1e-2), params, adj,
        1 - i0, i0, np.zeros_like(i0), beta, gamma, labels,
        idx_train=tr, idx_val=va, idx_test=te,
        epochs=15, verbose=False,
    )
    assert res.history[-1][1] < res.history[0][1]
    assert np.isfinite(res.test_loss) and res.best_epoch >= 0
