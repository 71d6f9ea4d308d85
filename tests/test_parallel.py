"""Multi-device tests on the 8-virtual-CPU mesh: sharded simulation,
SPMD data-parallel training step == single-device step, edge-sharded SpMM."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from gn_ode_sir_tpu.models import GNODE
from gn_ode_sir_tpu.ops import spmm_coo
from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
from gn_ode_sir_tpu.parallel import (
    make_mesh,
    make_spmd_train_step,
    simulate_sir_sharded,
    spmm_edge_sharded,
)
from gn_ode_sir_tpu.train.loss import l1_sir_loss


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


def test_sharded_sim_properties(karate, mesh):
    s, i, r = simulate_sir_sharded(
        karate, [0, 5], 0.3, 0.2, mesh=mesh, sims=4000, key=jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(s + i + r, 1.0, atol=1e-9)
    assert np.all(np.diff(r, axis=0) >= -1e-12)


def test_sharded_sim_matches_single_device(karate, mesh):
    """Same process, independent streams: means agree to MC tolerance."""
    from gn_ode_sir_tpu.sim import simulate_sir

    s1, i1, r1 = simulate_sir(karate, [0], 0.3, 0.2, sims=8000, key=jax.random.PRNGKey(1))
    s8, i8, r8 = simulate_sir_sharded(
        karate, [0], 0.3, 0.2, mesh=mesh, sims=8000, key=jax.random.PRNGKey(2)
    )
    assert np.abs(i1 - i8).mean() < 0.02


def test_sharded_sim_rejects_pallas_coins(karate, mesh):
    """The pallas coin kernel has no shard_map path; reject up front
    (mirrors simulate_sir_counts_many's batched-path gate)."""
    with pytest.raises(ValueError, match="pallas"):
        simulate_sir_sharded(
            karate, [0], 0.3, 0.2, mesh=mesh, sims=8, coins="pallas"
        )


def test_spmd_train_step_equals_single_device(random_graph, mesh):
    g = random_graph
    model = GNODE(hidden=8, max_time=10)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_spmd_train_step(model, opt, lambda gi: adj, mesh)

    B = 16
    rng = np.random.default_rng(0)
    i0 = np.zeros((B, g.n_nodes), np.float32)
    for b in range(B):
        i0[b, rng.choice(g.n_nodes, 2, replace=False)] = 1
    batch = {
        "s0": jnp.asarray(1 - i0),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, g.n_nodes)),
        "beta": jnp.full((B,), 0.3),
        "gamma": jnp.full((B,), 0.2),
        "weight": jnp.ones((B,)),
        "labels": jnp.asarray(rng.random((B, 10, g.n_nodes, 3)), jnp.float32),
        "graph_idx": jnp.zeros((B,), jnp.int32),
    }
    p_spmd, _, loss_spmd = step(params, opt_state, batch)

    def loss_fn(p):
        pred = model.predict(
            p, adj, batch["s0"], batch["i0"], batch["r0"], batch["beta"], batch["gamma"]
        )
        return l1_sir_loss(pred, batch["labels"], trial_weight=batch["weight"])

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_spmd), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_spmd), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_spmd_train_step_defaults_optional_batch_keys(random_graph, mesh):
    """Missing weight/graph_idx keys get their neutral defaults instead of
    an opaque shard_map pytree-structure error; the step result equals the
    fully-populated batch."""
    g = random_graph
    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_spmd_train_step(model, opt, lambda gi: adj, mesh)

    B = 8
    rng = np.random.default_rng(1)
    i0 = np.zeros((B, g.n_nodes), np.float32)
    i0[np.arange(B), rng.choice(g.n_nodes, B)] = 1
    base = {
        "s0": jnp.asarray(1 - i0), "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, g.n_nodes)),
        "beta": jnp.full((B,), 0.3), "gamma": jnp.full((B,), 0.2),
        "labels": jnp.asarray(rng.random((B, 6, g.n_nodes, 3)), jnp.float32),
    }
    full = dict(base, weight=jnp.ones((B,)),
                graph_idx=jnp.zeros((B,), jnp.int32))
    p_min, _, loss_min = step(params, opt_state, base)
    p_full, _, loss_full = step(params, opt_state, full)
    np.testing.assert_allclose(float(loss_min), float(loss_full), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_min),
                    jax.tree_util.tree_leaves(p_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spmd_train_step_dropout_rng(random_graph, mesh):
    """dropout_rng=True threads a key + train=True through the sharded
    forward — GCN's dropout must actually fire (different keys => different
    losses) and match fit()'s convention; without it the forward is
    deterministic (the round-5 review found SPMD silently skipped
    dropout for GCN/GIN)."""
    from gn_ode_sir_tpu.models import GCN, TimeUnrolledSIR
    from gn_ode_sir_tpu.ops import gcn_norm_edges
    from gn_ode_sir_tpu.ops.adjacency import CooAdj

    g = random_graph
    model = TimeUnrolledSIR(
        GCN(input_dim=5, hidden_dim=8, penultimate_dim=4, window=6,
            dropout=0.5)
    )
    params = model.init(jax.random.PRNGKey(0))
    src, dst, w = gcn_norm_edges(g)
    adj = CooAdj(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                 g.n_nodes)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_spmd_train_step(model, opt, lambda gi: adj, mesh,
                                dropout_rng=True)

    B = 8
    rng = np.random.default_rng(2)
    i0 = np.zeros((B, g.n_nodes), np.float32)
    i0[np.arange(B), rng.choice(g.n_nodes, B)] = 1
    batch = {
        "s0": jnp.asarray(1 - i0), "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, g.n_nodes)),
        "beta": jnp.full((B,), 0.3), "gamma": jnp.full((B,), 0.2),
        "labels": jnp.asarray(rng.random((B, 6, g.n_nodes, 3)), jnp.float32),
    }
    _, _, l_a = step(params, opt_state, batch, jax.random.PRNGKey(10))
    _, _, l_a2 = step(params, opt_state, batch, jax.random.PRNGKey(10))
    _, _, l_b = step(params, opt_state, batch, jax.random.PRNGKey(11))
    assert float(l_a) == float(l_a2), "same key must reproduce"
    assert float(l_a) != float(l_b), "dropout must draw from the key"
    # deterministic builder stays key-free and differs from the train=True
    # forward under 0.5 dropout
    det = make_spmd_train_step(model, opt, lambda gi: adj, mesh)
    _, _, l_det = det(params, opt_state, batch)
    assert float(l_det) != float(l_a)


def test_2d_spmd_train_step_equals_single_device(random_graph):
    """dp x edge mesh: one full GNODE training step must equal the
    single-device step — this exercises the edge-sharded SpMM's custom VJP
    (psum'd input cotangents keep upstream grads replicated)."""
    from gn_ode_sir_tpu.parallel import make_mesh, make_spmd_train_step_2d

    g = random_graph
    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    mesh2d = make_mesh((4, 2), ("data", "edge"))
    step = make_spmd_train_step_2d(model, opt, mesh2d, g.n_nodes)

    B = 8
    rng = np.random.default_rng(3)
    i0 = np.zeros((B, g.n_nodes), np.float32)
    for b in range(B):
        i0[b, rng.choice(g.n_nodes, 2, replace=False)] = 1
    batch = {
        "s0": jnp.asarray(1 - i0),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, g.n_nodes)),
        "beta": jnp.full((B,), 0.3),
        "gamma": jnp.full((B,), 0.2),
        "weight": jnp.ones((B,)),
        "labels": jnp.asarray(rng.random((B, 8, g.n_nodes, 3)), jnp.float32),
        "graph_idx": jnp.zeros((B,), jnp.int32),
    }
    E = g.n_edges
    pad = (-E) % 2
    src = jnp.asarray(np.concatenate([g.src, np.zeros(pad, np.int32)]))
    dst = jnp.asarray(np.concatenate([g.dst, np.zeros(pad, np.int32)]))
    w = jnp.asarray(np.concatenate([np.ones(E, np.float32), np.zeros(pad, np.float32)]))
    p_2d, _, loss_2d = step(params, opt_state, batch, src, dst, w)

    adj = adjacency_from_graph(g, prefer_dense=False)

    def loss_fn(p):
        pred = model.predict(
            p, adj, batch["s0"], batch["i0"], batch["r0"], batch["beta"], batch["gamma"]
        )
        return l1_sir_loss(pred, batch["labels"], trial_weight=batch["weight"])

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_2d), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_2d), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_spmd_multigraph_coo_equals_single_device(mesh):
    """Per-sample padded CooAdj multigraph aux under data-parallel sharding:
    the [B, E] edge gather rides the data axis while the per-graph aux stays
    replicated; step must equal the single-device weighted/masked step.
    This is the mis-shard-prone case VERDICT r1 flagged as untested."""
    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.train import multigraph_adj_fns
    from gn_ode_sir_tpu.train.loss import l1_sir_loss

    graphs = [load_graph("none", n_random=n, seed=s) for n, s in ((12, 0), (20, 1), (16, 2))]
    batch_g = pad_graphs(graphs, node_multiple=4, edge_multiple=16)
    adj_fn, node_mask_fn, aux = multigraph_adj_fns(batch_g, kind="coo")
    aux = jax.tree_util.tree_map(jnp.asarray, aux)

    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    # SGD so the param comparison is a direct gradient comparison (Adam's
    # first-step sign normalization amplifies FP summation-order noise)
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    step = make_spmd_train_step(
        model, opt, adj_fn, mesh, aux_example=aux, node_mask_fn=node_mask_fn
    )

    B, n_max = 8, batch_g.n_max
    rng = np.random.default_rng(7)
    graph_idx = np.asarray([0, 1, 2, 1, 0, 2, 1, 0], np.int32)
    i0 = np.zeros((B, n_max), np.float32)
    for b, g_i in enumerate(graph_idx):
        nn = int(batch_g.n_nodes[g_i])
        i0[b, rng.choice(nn, 2, replace=False)] = 1
    node_mask = np.asarray(batch_g.node_mask)[graph_idx]
    # uneven trial weights across shards (the case pmean aggregation broke)
    weight = jnp.asarray(rng.uniform(0.2, 2.0, B), jnp.float32)
    batch = {
        "s0": jnp.asarray((1 - i0) * node_mask),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, n_max)),
        "beta": jnp.full((B,), 0.3),
        "gamma": jnp.full((B,), 0.2),
        "weight": weight,
        "labels": jnp.asarray(rng.random((B, 8, n_max, 3)), jnp.float32),
        "graph_idx": jnp.asarray(graph_idx),
    }
    p_spmd, _, loss_spmd = step(params, opt_state, batch, aux)

    adj_full = adj_fn(batch["graph_idx"], aux)
    nm_full = node_mask_fn(batch["graph_idx"], aux)

    def loss_fn(p):
        pred = model.predict(
            p, adj_full, batch["s0"], batch["i0"], batch["r0"],
            batch["beta"], batch["gamma"],
        )
        return l1_sir_loss(
            pred, batch["labels"], trial_weight=batch["weight"], node_mask=nm_full
        )

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_spmd), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_spmd), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_edge_sharded_spmm(random_graph, mesh):
    g = random_graph
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, g.n_nodes, 8)), jnp.float32)
    E = g.n_edges
    pad = (-E) % 8
    src_p = np.concatenate([g.src, np.zeros(pad, np.int32)])
    dst_p = np.concatenate([g.dst, np.zeros(pad, np.int32)])
    w = np.concatenate([np.ones(E, np.float32), np.zeros(pad, np.float32)])

    f = jax.shard_map(
        lambda s, d, ww, xx: spmm_edge_sharded(s, d, xx, g.n_nodes, "data", ww),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = f(jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(w), x)
    ref = jax.vmap(lambda xb: spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), xb, g.n_nodes))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_2d_multigraph_edge_sharded_equals_single_device():
    """dp x edge mesh with PER-SAMPLE multigraph connectivity: every graph's
    padded edge row shards over the edge axis while trials shard over data;
    the full train step must equal the single-device masked/weighted step
    (exercises the per-sample branch of the edge-sharded SpMM's custom VJP)."""
    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.parallel import make_mesh, make_spmd_multigraph_train_step_2d
    from gn_ode_sir_tpu.train import multigraph_adj_fns

    graphs = [load_graph("none", n_random=n, seed=s) for n, s in ((12, 0), (20, 1), (16, 2))]
    batch_g = pad_graphs(graphs, node_multiple=4, edge_multiple=16)
    adj_fn, node_mask_fn, aux = multigraph_adj_fns(batch_g, kind="coo")
    aux = jax.tree_util.tree_map(jnp.asarray, aux)
    assert batch_g.e_max % 2 == 0

    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    mesh2d = make_mesh((4, 2), ("data", "edge"))
    step = make_spmd_multigraph_train_step_2d(
        model, opt, mesh2d, batch_g.n_max, aux, node_mask_fn=node_mask_fn
    )

    B, n_max = 8, batch_g.n_max
    rng = np.random.default_rng(11)
    graph_idx = np.asarray([0, 1, 2, 1, 0, 2, 1, 0], np.int32)
    i0 = np.zeros((B, n_max), np.float32)
    for b, g_i in enumerate(graph_idx):
        i0[b, rng.choice(int(batch_g.n_nodes[g_i]), 2, replace=False)] = 1
    node_mask = np.asarray(batch_g.node_mask)[graph_idx]
    weight = jnp.asarray(rng.uniform(0.2, 2.0, B), jnp.float32)
    batch = {
        "s0": jnp.asarray((1 - i0) * node_mask),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, n_max)),
        "beta": jnp.full((B,), 0.3),
        "gamma": jnp.full((B,), 0.2),
        "weight": weight,
        "labels": jnp.asarray(rng.random((B, 8, n_max, 3)), jnp.float32),
        "graph_idx": jnp.asarray(graph_idx),
    }
    p_2d, _, loss_2d = step(params, opt_state, batch, aux)

    adj_full = adj_fn(batch["graph_idx"], aux)
    nm_full = node_mask_fn(batch["graph_idx"], aux)

    def loss_fn(p):
        pred = model.predict(
            p, adj_full, batch["s0"], batch["i0"], batch["r0"],
            batch["beta"], batch["gamma"],
        )
        return l1_sir_loss(
            pred, batch["labels"], trial_weight=batch["weight"], node_mask=nm_full
        )

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_2d), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_2d), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_spmd_multigraph_pallas2_stack_equals_single_device(mesh):
    """The stacked-Pallas2 multigraph connectivity under data-parallel
    sharding: the plan stacks replicate, each shard gathers its (graph-
    homogeneous) batch's plan, and the step equals single-device."""
    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.train import multigraph_pallas2_fns
    from gn_ode_sir_tpu.train.loss import l1_sir_loss

    graphs = [load_graph("none", n_random=n, seed=s) for n, s in ((12, 0), (20, 1))]
    batch_g = pad_graphs(graphs, node_multiple=4, edge_multiple=16)
    tr_fn, ev_fn, node_mask_fn, aux = multigraph_pallas2_fns(
        batch_g, eval_graph=-1, k_edges=16, r_rows=8, interpret=True)
    aux = jax.tree_util.tree_map(jnp.asarray, aux)

    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    step = make_spmd_train_step(
        model, opt, tr_fn, mesh, aux_example=aux, node_mask_fn=node_mask_fn
    )

    B, n_max = 8, batch_g.n_max
    rng = np.random.default_rng(13)
    graph_idx = np.zeros(B, np.int32)  # homogeneous batch (train graph 0)
    i0 = np.zeros((B, n_max), np.float32)
    for b in range(B):
        i0[b, rng.choice(int(batch_g.n_nodes[0]), 2, replace=False)] = 1
    node_mask = np.asarray(batch_g.node_mask)[graph_idx]
    batch = {
        "s0": jnp.asarray((1 - i0) * node_mask),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, n_max)),
        "beta": jnp.full((B,), 0.3),
        "gamma": jnp.full((B,), 0.2),
        "weight": jnp.asarray(rng.uniform(0.2, 2.0, B), jnp.float32),
        "labels": jnp.asarray(rng.random((B, 8, n_max, 3)), jnp.float32),
        "graph_idx": jnp.asarray(graph_idx),
    }
    p_spmd, _, loss_spmd = step(params, opt_state, batch, aux)

    adj_full = tr_fn(batch["graph_idx"], aux)
    nm_full = node_mask_fn(batch["graph_idx"], aux)

    def loss_fn(p):
        pred = model.predict(
            p, adj_full, batch["s0"], batch["i0"], batch["r0"],
            batch["beta"], batch["gamma"],
        )
        return l1_sir_loss(
            pred, batch["labels"], trial_weight=batch["weight"], node_mask=nm_full
        )

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_spmd), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_spmd), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


_DIST_WORKER = r"""
import sys
proc_id, port = int(sys.argv[1]), sys.argv[2]
from gn_ode_sir_tpu.parallel.distributed import init_distributed
assert init_distributed(f"localhost:{port}", 2, proc_id)
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
assert len(jax.local_devices()) == 1
mesh = Mesh(jax.devices(), ("data",))
# each process contributes rows valued (process_id + 1); a jitted global sum
# is a cross-process (DCN-layer) allreduce: 4*1 + 4*2 = 12
x = multihost_utils.host_local_array_to_global_array(
    jnp.ones((4,)) * (proc_id + 1), mesh, P("data"))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 12.0, float(total)
multihost_utils.sync_global_devices("done")
print("DIST_OK", proc_id)
"""


def test_init_distributed_two_process_cpu():
    """parallel.distributed.init_distributed actually brings up JAX's
    multi-process (DCN-layer) runtime: two CPU processes rendezvous at the
    coordinator, see one global 2-device topology, and a jitted global sum
    allreduces across processes (VERDICT r3 weak #4 — the multi-host claim,
    tested)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
           "XLA_FLAGS": ""}  # one local CPU device per process, no axon
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DIST_WORKER, str(k), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for k in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {k} rc={p.returncode}:\n{out}"
        assert f"DIST_OK {k}" in out


def test_spmd_predict_matches_single_device(karate, mesh):
    """Data-parallel inference (the serving path) returns the exact
    single-device trajectory, batch-sharded — no collective, no drift."""
    from gn_ode_sir_tpu.parallel import make_spmd_predict_fn

    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(karate)
    n = karate.n_nodes
    B = 16
    rng = np.random.default_rng(21)
    i0 = np.zeros((B, n), np.float32)
    for b in range(B):
        i0[b, rng.choice(n, 2, replace=False)] = 1.0
    batch = {
        "s0": jnp.asarray(1.0 - i0),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, n)),
        "beta": jnp.asarray(rng.uniform(0.1, 0.5, B), jnp.float32),
        "gamma": jnp.asarray(rng.uniform(0.1, 0.5, B), jnp.float32),
        "graph_idx": jnp.zeros((B,), jnp.int32),
    }
    predict = make_spmd_predict_fn(model, lambda gi: adj, mesh)
    out = predict(params, batch)
    ref = model.predict(params, adj, batch["s0"], batch["i0"], batch["r0"],
                        batch["beta"], batch["gamma"])
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_spmd_predict_multigraph_masks_padding(mesh):
    """Serving-path inference over a padded multigraph batch: per-trial
    connectivity gathered from replicated aux, padding nodes zeroed."""
    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.parallel import make_spmd_predict_fn
    from gn_ode_sir_tpu.train import multigraph_adj_fns

    graphs = [load_graph("none", n_random=n, seed=s) for n, s in ((12, 0), (20, 1))]
    batch_g = pad_graphs(graphs, node_multiple=4, edge_multiple=16)
    adj_fn, mask_fn, aux = multigraph_adj_fns(batch_g, kind="coo")
    aux = jax.tree_util.tree_map(jnp.asarray, aux)
    model = GNODE(hidden=8, max_time=8)
    params = model.init(jax.random.PRNGKey(1))
    n_max = batch_g.n_max
    B = 8
    rng = np.random.default_rng(3)
    gi = np.asarray([0, 1] * (B // 2), np.int32)
    i0 = np.zeros((B, n_max), np.float32)
    for b in range(B):
        i0[b, rng.choice(int(batch_g.n_nodes[gi[b]]), 2, replace=False)] = 1.0
    nm = np.asarray(batch_g.node_mask)[gi]
    batch = {
        "s0": jnp.asarray((1.0 - i0) * nm),
        "i0": jnp.asarray(i0),
        "r0": jnp.zeros((B, n_max)),
        "beta": jnp.full((B,), 0.3),
        "gamma": jnp.full((B,), 0.2),
        "graph_idx": jnp.asarray(gi),
    }
    predict = make_spmd_predict_fn(model, adj_fn, mesh, aux_example=aux,
                                   node_mask_fn=mask_fn)
    out = np.asarray(predict(params, batch, aux))
    ref = np.asarray(model.predict(
        params, adj_fn(batch["graph_idx"], aux), batch["s0"], batch["i0"],
        batch["r0"], batch["beta"], batch["gamma"],
    )) * nm[None, :, :, None]
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    # padding rows are exactly zero for every trial
    for b in range(B):
        n_real = int(batch_g.n_nodes[gi[b]])
        assert np.all(out[:, b, n_real:, :] == 0.0)


def test_sharding_helpers_place_and_preserve():
    """`data_sharding` splits the leading axis over the mesh, `replicated_
    sharding` copies — placement only, values intact (the helpers behind
    manual jax.device_put placement of trial stores and params)."""
    from gn_ode_sir_tpu.parallel.mesh import data_sharding, replicated_sharding

    mesh = make_mesh()
    ndev = len(jax.devices())
    x = np.arange(ndev * 3 * 2, dtype=np.float32).reshape(ndev * 3, 2)
    xd = jax.device_put(x, data_sharding(mesh, rank=x.ndim))
    assert xd.sharding.spec == P("data", None)
    # leading axis is actually split: one shard holds 1/ndev of the rows
    assert xd.addressable_shards[0].data.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(xd), x)

    p = jax.device_put(np.float32(7.0), replicated_sharding(mesh))
    assert p.sharding.spec == P()
    assert len(p.addressable_shards) == ndev
    assert float(p) == 7.0
