"""Model-family tests: shapes, probability simplex, learning signal, DMP oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gn_ode_sir_tpu.models import DMPSIR, GCN, GIN, GNODE
from gn_ode_sir_tpu.models.gnode import legacy_dense_gnode
from gn_ode_sir_tpu.ops import gcn_norm_edges
from gn_ode_sir_tpu.ops.adjacency import CooAdj, adjacency_from_graph


def _toy_batch(g, B=3, seed=0):
    rng = np.random.default_rng(seed)
    i0 = np.zeros((B, g.n_nodes), np.float32)
    for b in range(B):
        i0[b, rng.choice(g.n_nodes, 2, replace=False)] = 1
    s0 = 1 - i0
    r0 = np.zeros_like(i0)
    beta = jnp.asarray(rng.uniform(0.1, 0.5, B), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.1, 0.5, B), jnp.float32)
    return jnp.asarray(s0), jnp.asarray(i0), jnp.asarray(r0), beta, gamma


def test_gnode_shapes_and_simplex(random_graph):
    g = random_graph
    model = GNODE(hidden=16, max_time=10)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    s0, i0, r0, beta, gamma = _toy_batch(g)
    full = model.apply(params, adj, s0, i0, r0, beta, gamma)
    assert full.shape == (20, 3, g.n_nodes, 3)  # [T_grid, B, n, 3]
    np.testing.assert_allclose(np.asarray(full.sum(-1)), 1.0, atol=1e-5)
    pred = model.predict(params, adj, s0, i0, r0, beta, gamma)
    assert pred.shape == (10, 3, g.n_nodes, 3)


def test_gnode_legacy_variant(random_graph):
    g = random_graph
    model = legacy_dense_gnode(hidden=8, max_time=10)
    params = model.init(jax.random.PRNGKey(0))
    assert "ln_scale" in params
    adj = adjacency_from_graph(g)
    s0, i0, r0, beta, gamma = _toy_batch(g, B=1)
    pred = model.predict(params, adj, s0, i0, r0, beta, gamma)
    assert pred.shape == (10, 1, g.n_nodes, 3)
    assert np.isfinite(np.asarray(pred)).all()


def test_gnode_euler_step_analytic():
    """Pin the GN-ODE vector field to the reference math on a 2-node graph.

    With hidden=1 and hand-set weights, one euler step is computable by hand:
      E_c = relu(w_e * c0 + b_e); Z_c = sigmoid(w_f * E_c + b_f)
      dS = -beta * (A @ Z_I) * Z_S; dI = -dS - gamma * Z_I; dR = gamma * Z_I
    (reference ode_nn_ngraph_sim.py:58-96,151-156)."""
    from gn_ode_sir_tpu.graphs.graph import graph_from_edges
    from gn_ode_sir_tpu.models.gnode import _get_func
    from gn_ode_sir_tpu.odeint import odeint_grid

    g = graph_from_edges(2, [(0, 1)])
    adj = adjacency_from_graph(g, prefer_dense=True)
    w_e, b_e, w_f, b_f = 2.0, -0.5, 1.5, 0.25
    params = {
        "enc": {"w": jnp.full((1, 1), w_e), "b": jnp.full((1,), b_e)},
        "func": {"w": jnp.full((1, 1), w_f), "b": jnp.full((1,), b_f)},
    }
    s0 = np.array([[0.0, 1.0]], np.float32)  # node 0 infected, node 1 susceptible
    i0 = np.array([[1.0, 0.0]], np.float32)
    r0 = np.zeros((1, 2), np.float32)
    beta, gamma = 0.4, 0.3

    def enc(c):
        return np.maximum(w_e * c + b_e, 0.0)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    E = {c: enc(v[0]) for c, v in {"s": s0, "i": i0, "r": r0}.items()}
    Z = {c: sig(w_f * E[c] + b_f) for c in E}
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    ds = -beta * (A @ Z["i"]) * Z["s"]
    di = -ds - gamma * Z["i"]
    dr = gamma * Z["i"]

    func = _get_func("sigmoid", False)
    y0 = tuple(jnp.asarray(E[c])[None, :, None] for c in ("s", "i", "r"))
    ts = jnp.asarray([0.0, 0.5])
    traj = odeint_grid(
        func, y0, ts, (params, jnp.asarray([beta]), jnp.asarray([gamma]), adj),
        method="euler", adjoint="direct",
    )
    got = [np.asarray(traj[k][1, 0, :, 0]) for k in range(3)]
    expect = [E["s"] + 0.5 * ds, E["i"] + 0.5 * di, E["r"] + 0.5 * dr]
    for a, b in zip(got, expect):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_gnode_learns(random_graph):
    """A few Adam steps on random-but-fixed labels must reduce the loss."""
    import optax

    from gn_ode_sir_tpu.train.loss import l1_sir_loss

    from gn_ode_sir_tpu.sim import sir_classical

    g = random_graph
    model = GNODE(hidden=8, max_time=10)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    s0, i0, r0, beta, gamma = _toy_batch(g)
    # fittable targets: mean-field SIR trajectories for the same trials
    labs = []
    for b in range(3):
        seeds = np.nonzero(np.asarray(i0[b]))[0]
        i_t, s_t, r_t = sir_classical(g, seeds, float(beta[b]), float(gamma[b]), max_time=10)
        labs.append(np.stack([s_t, i_t, r_t], -1))
    labels = jnp.asarray(np.stack(labs), jnp.float32)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.predict(p, adj, s0, i0, r0, beta, gamma)
            return l1_sir_loss(pred, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


@pytest.mark.parametrize("cls", [GCN, GIN])
def test_gnn_baselines(random_graph, cls):
    g = random_graph
    model = cls(input_dim=5, hidden_dim=8, penultimate_dim=4, window=10)
    params = model.init(jax.random.PRNGKey(0))
    if cls is GCN:
        src, dst, w = gcn_norm_edges(g)
        adj = CooAdj(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), g.n_nodes)
    else:
        adj = adjacency_from_graph(g, prefer_dense=False)
    s0, i0, r0, beta, gamma = _toy_batch(g)
    x = jnp.concatenate(
        [s0[..., None], i0[..., None], r0[..., None],
         jnp.broadcast_to(beta[:, None, None], (3, g.n_nodes, 1)),
         jnp.broadcast_to(gamma[:, None, None], (3, g.n_nodes, 1))],
        axis=-1,
    )
    out = model.apply(params, adj, x)
    assert out.shape == (9, 3, g.n_nodes, 3)  # window-1 time steps
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # train-mode dropout path runs
    out_t = model.apply(params, adj, x, rng=jax.random.PRNGKey(1), train=True)
    assert np.isfinite(np.asarray(out_t)).all()


def test_gnode_backsolve_adjoint(random_graph):
    """Backsolve-adjoint GNODE: identical forward, close gradients."""
    g = random_graph
    adj = adjacency_from_graph(g)
    s0, i0, r0, beta, gamma = _toy_batch(g, B=2)
    m_ck = GNODE(hidden=8, max_time=6, adjoint="checkpoint")
    m_bs = GNODE(hidden=8, max_time=6, adjoint="backsolve")
    params = m_ck.init(jax.random.PRNGKey(0))
    a = m_ck.predict(params, adj, s0, i0, r0, beta, gamma)
    b = m_bs.predict(params, adj, s0, i0, r0, beta, gamma)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def loss(p, model):
        pred = model.predict(p, adj, s0, i0, r0, beta, gamma)
        return jnp.abs(pred - 0.5).mean()

    g_ck = jax.grad(loss)(params, m_ck)
    g_bs = jax.grad(loss)(params, m_bs)
    for x, y in zip(jax.tree_util.tree_leaves(g_ck), jax.tree_util.tree_leaves(g_bs)):
        # backsolve reconstructs the state in reverse: O(dt) drift expected
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0.1, atol=2e-3)


def test_gnode_backsolve_adjoint_sparse_backends(random_graph):
    """Backsolve must work with the sparse adjacency backends whose pytrees
    carry int32 index leaves (COO/ELL): vjp used to return float0 cotangents
    for them and tree_map(jnp.negative, ...) crashed. Gradients must match
    the dense-backend backsolve (same math, different SpMM)."""
    g = random_graph
    s0, i0, r0, beta, gamma = _toy_batch(g, B=2)
    m_bs = GNODE(hidden=8, max_time=6, adjoint="backsolve")
    params = m_bs.init(jax.random.PRNGKey(0))

    def loss(p, adj):
        pred = m_bs.predict(p, adj, s0, i0, r0, beta, gamma)
        return jnp.abs(pred - 0.5).mean()

    grads = {}
    for kind in ("dense", "coo", "ell"):
        adj = adjacency_from_graph(g, kind=kind)
        grads[kind] = jax.grad(loss)(params, adj)
    for kind in ("coo", "ell"):
        for x, y in zip(jax.tree_util.tree_leaves(grads["dense"]),
                        jax.tree_util.tree_leaves(grads[kind])):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-6)


def test_backsolve_diff_mask_excludes_leaves():
    """diff_mask=False subtrees get ZERO cotangents and stay out of the
    reverse carry (GNODE marks the adjacency this way: a dense [n, n]
    cotangent per reverse step would negate backsolve's O(1) memory)."""
    from gn_ode_sir_tpu.odeint import odeint_grid_backsolve

    a_mat = jnp.eye(4) * 0.5
    w = jnp.ones((4,))

    def func(t, y, args):
        w_, a_ = args
        return (a_ @ y) * w_

    y0 = jnp.arange(4.0) + 1.0
    ts = jnp.linspace(0.0, 1.0, 6)

    def loss(args):
        ys = odeint_grid_backsolve(func, y0, ts, args, method="rk4",
                                   diff_mask=(True, False))
        return (ys[-1] ** 2).sum()

    gw, ga = jax.grad(loss)((w, a_mat))
    assert np.abs(np.asarray(gw)).sum() > 0, "masked-in leaf must get grads"
    np.testing.assert_array_equal(np.asarray(ga), 0.0)
    # unmasked run differentiates the matrix too
    gw2, ga2 = jax.grad(
        lambda args: (odeint_grid_backsolve(func, y0, ts, args,
                                            method="rk4")[-1] ** 2).sum()
    )((w, a_mat))
    assert np.abs(np.asarray(ga2)).sum() > 0
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw), rtol=1e-6)


def test_dmp_matches_mc_on_tree():
    """DMP is exact on trees — marginals must match MC to sampling error.

    (On loopy graphs DMP is only an approximation — the reference uses it as
    a baseline on real sparse networks, ``dmp.py:347-366``.)"""
    import networkx as nx

    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx
    from gn_ode_sir_tpu.sim import simulate_sir

    G = nx.balanced_tree(2, 4)  # 31-node binary tree
    g = graph_from_networkx(G, name="tree")
    seeds = [0]
    beta, gamma = 0.3, 0.2
    dmp = DMPSIR.from_graph(g)
    m = np.asarray(dmp.run(seeds, beta, gamma, max_time=15))
    s, i, r = simulate_sir(g, seeds, beta, gamma, sims=40000, max_time=15,
                           key=jax.random.PRNGKey(0))
    mc = np.stack([s, i, r], axis=-1)
    assert np.abs(m - mc).mean() < 0.005
    assert np.abs(m - mc).max() < 0.03
    # marginals are a probability simplex
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-4)


def test_dmp_short_horizons():
    """max_time 1 and 2 must return [T, N, 3] without tracing a
    negative-length scan (max_time=1 used to raise an MLIRError), and must
    prefix-match a longer run (the recursion is causal)."""
    from gn_ode_sir_tpu.graphs import graph_from_edges
    from gn_ode_sir_tpu.models import DMPSIR

    g = graph_from_edges(5, [(0, 1), (1, 2), (2, 3), (3, 4)], name="path")
    dmp = DMPSIR.from_graph(g)
    full = np.asarray(dmp.run([0], 0.4, 0.3, max_time=6))
    for T in (1, 2, 3):
        out = np.asarray(dmp.run([0], 0.4, 0.3, max_time=T))
        assert out.shape == (T, 5, 3)
        np.testing.assert_allclose(out, full[:T], rtol=1e-6, atol=1e-7)
    many = np.asarray(dmp.run_many([[0], [2]], [0.4, 0.2], [0.3, 0.1],
                                   max_time=2))
    assert many.shape == (2, 2, 5, 3)
    with pytest.raises(ValueError):
        dmp.run([0], 0.4, 0.3, max_time=0)


def test_dmp_run_many_matches_per_trial():
    """run_many (one vmapped program over the trial batch) must reproduce
    the per-trial run results; heterogeneous [B, E]/[B, n] parameter arrays
    ride the same path."""
    import networkx as nx

    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx

    g = graph_from_networkx(nx.random_regular_graph(3, 20, seed=4),
                            name="reg-many")
    dmp = DMPSIR.from_graph(g)
    rng = np.random.default_rng(7)
    B, E, n = 5, g.src.shape[0], g.n_nodes
    seed_sets = [rng.choice(n, 2, replace=False) for _ in range(B)]
    betas = rng.uniform(0.1, 0.5, B).astype(np.float32)
    gammas = rng.uniform(0.1, 0.5, B).astype(np.float32)

    batched = np.asarray(dmp.run_many(seed_sets, betas, gammas, max_time=12))
    assert batched.shape == (B, 12, n, 3)
    for k in range(B):
        single = np.asarray(dmp.run(seed_sets[k], float(betas[k]),
                                    float(gammas[k]), max_time=12))
        np.testing.assert_allclose(batched[k], single, rtol=1e-6, atol=1e-7)

    # per-edge / per-node arrays with a batch axis
    w = rng.uniform(0.1, 0.5, (B, E)).astype(np.float32)
    gam = rng.uniform(0.1, 0.5, (B, n)).astype(np.float32)
    batched_h = np.asarray(dmp.run_many(seed_sets, w, gam, max_time=12))
    for k in range(B):
        single = np.asarray(dmp.run(seed_sets[k], w[k], gam[k], max_time=12))
        np.testing.assert_allclose(batched_h[k], single, rtol=1e-6, atol=1e-7)


def test_dmp_heterogeneous_parameters():
    """DMPSIR.run accepts per-edge weights / per-node gamma (reference
    ``DMP_SIR(weight_adj, nodes_gamma)`` surface, ``dmp.py:163-170``)."""
    import networkx as nx

    from gn_ode_sir_tpu.graphs.graph import graph_from_networkx

    G = nx.balanced_tree(2, 3)  # 15-node binary tree, root 0
    g = graph_from_networkx(G, name="tree-het")
    dmp = DMPSIR.from_graph(g)
    E, n = g.src.shape[0], g.n_nodes

    # constant arrays reproduce the scalar path bit-for-bit
    m_scalar = np.asarray(dmp.run([0], 0.35, 0.15, max_time=12))
    m_array = np.asarray(dmp.run(
        [0], np.full(E, 0.35, np.float32), np.full(n, 0.15, np.float32),
        max_time=12))
    np.testing.assert_array_equal(m_scalar, m_array)

    # zero-weight edges block transmission: cut node 2's subtree off
    sub = {2} | set(nx.descendants(nx.bfs_tree(G, 0), 2))
    w = np.full(E, 0.35, np.float32)
    w[[k for k in range(E) if g.src[k] in sub or g.dst[k] in sub]] = 0.0
    m_cut = np.asarray(dmp.run([0], w, 0.15, max_time=12))
    np.testing.assert_allclose(m_cut[:, sorted(sub), 0], 1.0, atol=1e-6)
    # the un-cut subtree still gets infected
    assert m_cut[-1, 1, 0] < 0.9
    np.testing.assert_allclose(m_cut.sum(-1), 1.0, atol=1e-4)

    # per-node gamma: symmetric twins under the root, one recovers faster
    gam = np.full(n, 0.1, np.float32)
    gam[1] = 0.9  # node 1 and node 2 are symmetric children of the root
    m_het = np.asarray(dmp.run([0], 0.35, gam, max_time=12))
    assert m_het[-1, 1, 2] > m_het[-1, 2, 2]  # higher gamma -> more recovered


def test_dmp_cave_index():
    from gn_ode_sir_tpu.models import cave_index

    src = np.asarray([0, 1, 1, 2, 3])
    dst = np.asarray([1, 0, 2, 1, 0])  # edge 4 (3->0) has no reverse
    cave = cave_index(src, dst)
    assert cave[0] == 1 and cave[1] == 0
    assert cave[2] == 3 and cave[3] == 2
    assert cave[4] == 5  # sentinel E


def test_solver_policy_resolution():
    """auto -> direct + full unroll while the trajectory fits the budget,
    checkpointed scan beyond it; explicit choices pass through."""
    from gn_ode_sir_tpu.models.gnode import device_activation_budget, solver_policy

    # budget derives from the device (1/8 of bytes_limit when the backend
    # reports one; the CPU test backend usually falls back to 2 GB) — on a
    # 16 GB v5e this reproduces the validated ~2 GB threshold
    budget = device_activation_budget()
    assert 1_000_000_000 <= budget <= 8_000_000_000

    # karate-scale: tiny trajectory -> direct, unroll = n_steps-1
    adj, unroll = solver_policy(34, 64, 1, 20, 0.5)
    assert adj == "direct" and unroll == 39
    # enron-scale batch: 40*3*4*33696*64*4 bytes ~ 4.1 GB -> checkpoint at
    # the 2 GB threshold (pinned explicitly so the assertion is
    # device-independent)
    adj, unroll = solver_policy(33696, 64, 4, 20, 0.5, budget_bytes=2_000_000_000)
    assert adj == "checkpoint" and unroll == 1
    # explicit override wins
    adj, unroll = solver_policy(34, 64, 1, 20, 0.5, adjoint="backsolve", unroll=4)
    assert adj == "backsolve" and unroll == 4
