"""Benchmark entry point — prints ONE JSON line for the round driver.

Headline metric (BASELINE.json): Monte-Carlo SIR label-extraction throughput
on openflights (2,905 nodes / 31,290 directed edges), the reference's
``sir_torch`` path (``ode_nn.py:30-88``). Measured at 80,000
simulations/dispatch since round 5 (10k left the reading ~half tunnel
round-trip — see ``measure_ours``); the proxy baseline is per-sim, so
``vs_baseline`` is protocol-independent.

Second first-class metric (BASELINE.md north-star (a)): GN-ODE training
epoch time on wiki-vote at the reference defaults (200 trials -> 120 train
steps/epoch at batch_size=1, hidden=64, euler over 40 steps,
``monitorer-sim.py:10-24``). It rides in the same JSON line under
``extra_metrics`` and in ``BENCH_DETAILS.json``.

vs_baseline: ratio against measured reference-algorithm proxies — the same
algorithms executed the way the reference executes them, on this machine
(torch CPU; the reference hardcodes ``.cuda()`` but no GPU exists here):

- MC proxy: Python loop over simulations and steps, per-step edge filtering
  with torch ops (``ode_nn.py:46-82``). An A100 would be dispatch-bound on
  the same ~190k tiny kernels, so the CPU proxy is the right order of
  magnitude.
- Train proxy: the reference training step *algorithm* — state [4Bn, h]
  with params smuggled in the last quarter, Linear+sigmoid, the per-f-eval
  ``scipy.sparse.block_diag`` rebuild + COO->LongTensor conversion
  (``ode_nn_ngraph_sim.py:68-70``), ``scatter_add_`` SpMM (``:73``), euler
  over maxTime/deltaT steps, decode + softmax + L1 + Adam. Gradients use
  direct autograd through the euler loop, which is CHEAPER than the
  reference's ``odeint_adjoint`` backward solve (``:168``) — the proxy is a
  deliberate lower bound on reference cost, so vs_baseline is conservative.

Proxies are measured once and cached in ``bench_baseline.json``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
GRAPHS = os.path.join(ROOT, "..", "reference", "real_graphs")
if not os.path.isdir(GRAPHS):
    GRAPHS = "/root/reference/real_graphs"

BASELINE_CACHE = os.path.join(ROOT, "bench_baseline.json")
DETAILS = os.path.join(ROOT, "BENCH_DETAILS.json")

SIMS = 80_000
MAX_TIME = 20
# round-3 shipped enron multigraph epoch (padded single grid, full-width
# train) — the within-framework baseline the mg-epoch metric compares to
R3_MG_EPOCH_S = 3.77
BETA, GAMMA = 0.3, 0.2
SEEDS = [0, 5]

# reference training defaults (monitorer-sim.py:10-24)
HIDDEN = 64
DELTA_T = 0.5
TRIALS = 200
BATCH = 1
TRAIN_STEPS_PER_EPOCH = int(0.6 * TRIALS) // BATCH  # 120


def _reference_proxy_sims_per_sec(graph, n_probe: int = 20) -> float:
    """Time the reference's per-simulation loop algorithm (torch CPU).

    Same process as ``sir_torch``: one Bernoulli coin per infected->susceptible
    contact per step, one recovery coin per infected node, Python loop over
    simulations and time steps. Implemented independently for timing.
    """
    import torch

    edges = torch.from_numpy(np.stack([graph.src, graph.dst], axis=1).astype(np.int64))
    n = graph.n_nodes
    g = torch.Generator().manual_seed(0)
    start = time.perf_counter()
    for _ in range(n_probe):
        i_state = torch.zeros(n)
        s_state = torch.ones(n)
        r_state = torch.zeros(n)
        i_state[SEEDS] = 1
        s_state[SEEDS] = 0
        acc = torch.zeros((MAX_TIME, 3, n))
        for it in range(1, MAX_TIME):
            idx_i = torch.where(i_state == 1)[0]
            contact = edges[torch.isin(edges[:, 0], idx_i)]
            targets = contact[:, 1]
            targets = targets[s_state[targets] == 1]
            coins = torch.rand(targets.shape[0], generator=g)
            new_inf = targets[coins < BETA]
            coins = torch.rand(idx_i.shape[0], generator=g)
            new_rec = idx_i[coins < GAMMA]
            r_state[new_rec] = 1
            i_state[new_inf] = 1
            i_state[new_rec] = 0
            s_state[new_inf] = 0
            acc[it, 0] += s_state
            acc[it, 1] += i_state
            acc[it, 2] += r_state
    elapsed = time.perf_counter() - start
    return n_probe / elapsed


def _reference_proxy_train_step_s(graph, n_probe: int = 3) -> float:
    """Time one reference-algorithm GN-ODE training step (torch CPU).

    Faithful to the hot path of ``ode_nn_ngraph_sim.py``: encode S0/I0/R0
    through a shared Linear(1,h)+ReLU (:151-156), integrate the ODE function
    with fixed-step euler over ``maxTime/deltaT`` points (:168) where EVERY
    function evaluation pays Linear(h,h)+sigmoid (:62-63), a host
    ``scipy.sparse.block_diag`` rebuild + COO index tensor construction
    (:68-70), a ``scatter_add_`` SpMM (:73) and the SIR derivative template
    (:75-96); decode h->4->1 per channel + softmax (:172-187); L1 on t>=1
    (:234); Adam step. Direct autograd replaces the adjoint backward solve
    (cheaper => conservative baseline). Written independently.
    """
    import scipy.sparse as sp
    import torch

    n = graph.n_nodes
    a_coo = sp.coo_matrix(
        (np.ones(len(graph.src), np.float32), (graph.dst, graph.src)),
        shape=(n, n),
    )
    n_steps = int(MAX_TIME / DELTA_T)
    dt = DELTA_T
    h = HIDDEN

    torch.manual_seed(0)
    enc = torch.nn.Linear(1, h)
    lin = torch.nn.Linear(h, h)
    dec1 = torch.nn.Linear(h, 4)
    dec2 = torch.nn.Linear(4, 1)
    params = (
        list(enc.parameters()) + list(lin.parameters())
        + list(dec1.parameters()) + list(dec2.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-4)

    i0 = torch.zeros(n)
    i0[SEEDS] = 1.0
    s0 = 1.0 - i0
    r0 = torch.zeros(n)
    labels = torch.rand(MAX_TIME, n, 3)
    labels = labels / labels.sum(-1, keepdim=True)

    def f(state):
        sir = torch.sigmoid(lin(state[: 3 * n]))
        s_e, i_e = sir[:n], sir[n : 2 * n]
        # the reference rebuilds the block-diagonal adjacency on the host
        # inside every f-eval (ode_nn_ngraph_sim.py:68-70) — reproduced here
        # because it is part of the measured algorithm
        bdiag = sp.block_diag([a_coo for _ in range(BATCH)])
        idx = torch.from_numpy(np.vstack((bdiag.row, bdiag.col)).astype(np.int64))
        ai = torch.zeros_like(i_e).scatter_add_(
            0, idx[0].unsqueeze(1).expand(-1, h), i_e[idx[1]]
        )
        ds = -BETA * ai * s_e
        dr = GAMMA * i_e
        di = -ds - dr
        return torch.cat((ds, di, dr, torch.zeros_like(state[3 * n :])))

    def step():
        opt.zero_grad()
        s_h = torch.relu(enc(s0.unsqueeze(-1)))
        i_h = torch.relu(enc(i0.unsqueeze(-1)))
        r_h = torch.relu(enc(r0.unsqueeze(-1)))
        pblock = torch.zeros(n, h)
        state = torch.cat((s_h, i_h, r_h, pblock))
        traj = [state]
        for _ in range(n_steps - 1):
            state = state + dt * f(state)
            traj.append(state)
        sol = torch.stack(traj)  # [n_steps, 4n, h]
        # integer-time resample (get_sir_t_nodes_torch, ode_nn.py:249-261)
        pick = torch.arange(MAX_TIME) * int(1 / DELTA_T)
        sol = sol[pick]
        outs = []
        for c in range(3):
            z = sol[:, c * n : (c + 1) * n]
            outs.append(dec2(torch.relu(dec1(z))))
        pred = torch.softmax(torch.cat(outs, -1), -1)
        loss = torch.nn.functional.l1_loss(pred[1:], labels[1:])
        loss.backward()
        opt.step()

    step()  # warm caches
    start = time.perf_counter()
    for _ in range(n_probe):
        step()
    return (time.perf_counter() - start) / n_probe


def measure_ours(graph, repeats: int = 8):
    # Protocol note (round 5): SIMS was 10,000 (the reference worker's per-
    # trial count) through round 4, which left the headline ~half dispatch
    # overhead — one tunnel round-trip costs 15-40+ ms against ~38 ms of
    # device work, so session health swung the reading 106k-192k sims/s
    # with identical code. At 80,000 sims/dispatch the device work
    # dominates (same-window A/B: 10k -> 144k/s, 40k -> 257k/s, 80k ->
    # 265k/s, runs_r5/sim_scale_ab.log) and matches production label
    # extraction, which batches many trials per dispatch
    # (simulate_sir_many). vs_baseline stays apples-to-apples: the torch
    # proxy is a per-sim cost extrapolation. Rounds <=4 values carry the
    # overhead and are not comparable.
    # best-of-8: repeats converge the min past residual tunnel jitter.
    import jax

    from gn_ode_sir_tpu.sim import simulate_sir

    # compile (excluded from timing); simulate_sir does a full host readback
    simulate_sir(graph, SEEDS, BETA, GAMMA, sims=SIMS, max_time=MAX_TIME,
                 key=jax.random.PRNGKey(0))
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        simulate_sir(graph, SEEDS, BETA, GAMMA, sims=SIMS, max_time=MAX_TIME,
                     key=jax.random.PRNGKey(r + 1))
        best = min(best, time.perf_counter() - t0)
    return SIMS / best, best


def _bench_trial_setup(graph, hidden: int):
    """Shared workload builder for the train-epoch and ensemble metrics:
    the reference protocol's epoch shapes (120 steps, batch 1) over 8
    distinct synthetic trials — timing depends only on shapes. Returns
    ``(model, optimizer, d, adj_fn, bi, bw)``."""
    import jax
    import optax

    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.models.gnode import solver_policy
    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
    from gn_ode_sir_tpu.train import TrialData
    from gn_ode_sir_tpu.train.loop import _data_to_device

    n = graph.n_nodes
    rng = np.random.default_rng(0)
    n_distinct = 8  # timing is per-row gather; distinct-trial count is free
    i0 = np.zeros((n_distinct, n), np.float32)
    for k in range(n_distinct):
        i0[k, rng.choice(n, 2, replace=False)] = 1.0
    labels = rng.random((n_distinct, MAX_TIME, n, 3)).astype(np.float32)
    labels /= labels.sum(-1, keepdims=True)
    data = TrialData(
        s0=1.0 - i0, i0=i0, r0=np.zeros_like(i0),
        beta=rng.uniform(0.1, 0.5, n_distinct).astype(np.float32),
        gamma=rng.uniform(0.1, 0.5, n_distinct).astype(np.float32),
        labels=labels,
        graph_idx=np.zeros(n_distinct, np.int32),
    )
    adjoint, unroll = solver_policy(n, hidden, BATCH, MAX_TIME, DELTA_T)
    model = GNODE(hidden=hidden, max_time=MAX_TIME, delta_t=DELTA_T,
                  adjoint=adjoint, solver_unroll=unroll)
    optimizer = optax.adam(1e-4)
    d = _data_to_device(data)
    d["__adj_aux__"] = {"adj": adjacency_from_graph(graph)}
    bi = (np.arange(TRAIN_STEPS_PER_EPOCH, dtype=np.int32) % n_distinct)[:, None]
    bw = np.ones((TRAIN_STEPS_PER_EPOCH, BATCH), np.float32)
    return model, optimizer, d, (lambda gi, aux: aux["adj"]), bi, bw


def measure_ours_train_epoch(graph, repeats: int = 3):
    """Whole-epoch GN-ODE training time at reference defaults (120 steps,
    batch 1, hidden 64) — one compiled ``lax.scan`` program, timed with a
    host readback (block_until_ready lies through the axon tunnel)."""
    import jax

    from gn_ode_sir_tpu.train.loop import make_train_epoch_fn

    model, optimizer, d, adj_fn, bi, bw = _bench_trial_setup(graph, HIDDEN)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    train_epoch = make_train_epoch_fn(model, optimizer, adj_fn)
    key = jax.random.PRNGKey(1)

    def run():
        p, o, loss = train_epoch(params, opt_state, d, bi, bw, key)
        # full host readbacks force completion through the tunnel
        return float(np.asarray(loss)) + float(
            np.asarray(jax.tree_util.tree_leaves(p)[0]).sum()
        )

    run()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_spmm_apply(graph, hidden: int = 64, chain: int = 800, repeats: int = 3):
    """Per-apply time of the large-graph SpMM backend (pallas2 on TPU): one
    jitted program scanning ``chain`` chained applies so tunnel dispatch
    noise cancels.

    Protocol note (round 5): chain was 50 through round 4, which left the
    metric overhead-dominated: per-apply device cost is <1 ms, while one
    dispatch+readback through the tunnel costs 5–200 ms depending on
    session health — so chain=50 measured mostly the tunnel (the round-4
    "drift" 1.887→4.07 ms, RESULTS.md §5a; same-session A/B: chain 50 →
    5.29 ms/apply, chain 800 → 0.91 ms/apply,
    `runs_r5/spmm_chain_ab.log`). chain=800 puts ~0.7 s
    of device work behind one dispatch, so the reading is the kernel, not
    the session. Values from rounds ≤4 are not comparable.
    """
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph

    adj = adjacency_from_graph(
        graph, kind="ell" if jax.default_backend() == "cpu" else "pallas2"
    )
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, graph.n_nodes, hidden)),
        jnp.float32,
    )

    @jax.jit
    def run(adj, x):
        def body(y, _):
            y = adj.matvec(y)
            # renormalize so the chain neither explodes nor denormals
            return y / (jnp.abs(y).max() + 1e-6), None

        y, _ = jax.lax.scan(body, x, None, length=chain)
        return y

    float(np.asarray(run(adj, x0)).sum())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(adj, x0)).sum())
        best = min(best, time.perf_counter() - t0)
    return best / chain


def measure_mg_epoch(repeats: int = 3, dataset: str | None = None,
                     counts: list[int] | None = None, sims: int = 200,
                     batch_size: int = 8):
    """Enron-scale multigraph TRAIN epoch through the default library path.

    The ngraphs-protocol hot path (``monitorer-ngraphs.py:10-23`` shapes:
    graphs dolphins..enron, trial counts [36]*5+[120], batch_size=8 -> 25
    grouped steps, hidden=8, euler over maxTime/deltaT=40 f-evals), built
    exactly the way a user gets it — ``multigraph_auto_fns`` resolving to the
    stacked-Pallas2 plans with per-graph chunk grids and the train-side node
    view (ARCHITECTURE.md). Matches the probe lever ``epoch_f32_b8_nodeview``
    in ``runs_r4/probe_mg_epoch.json``.

    Trial params are generated and labels extracted at sim=200: the compiled
    epoch's timing depends only on array SHAPES (counts/batch/hidden), never
    on label values, so the cheap extraction keeps this self-contained (no
    dependence on any run directory's label cache). Returns
    ``(best_epoch_s, steps, backend_kind)``.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from gn_ode_sir_tpu.graphs import load_graphs
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.train import (
        assemble_multigraph_trials,
        multigraph_auto_fns,
        multigraph_split,
    )
    from gn_ode_sir_tpu.train.data import epoch_batches_grouped
    from gn_ode_sir_tpu.train.loop import _data_to_device, make_train_epoch_fn

    counts = counts or [36, 36, 36, 36, 36, 120]
    graphs = load_graphs(dataset or os.path.join(
        GRAPHS, "dolphins+fb-food+fb-social+openflights+wiki-vote+enron"))
    rng = np.random.default_rng(0)
    per_graph = [
        [([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
          float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
         for _ in range(c)]
        for g, c in zip(graphs, counts)
    ]
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, label_dirs=None, sim=sims, max_time=MAX_TIME,
        rng_key=jax.random.PRNGKey(0))
    conn = multigraph_auto_fns(batch)
    tr, _, _ = multigraph_split(counts)
    model = GNODE(hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    d = _data_to_device(data)
    d["__adj_aux__"] = jax.tree_util.tree_map(jnp.asarray, conn.aux)
    train_epoch = make_train_epoch_fn(
        model, optimizer, conn.adj_fn, conn.node_mask_fn,
        n_view=getattr(conn.adj_fn, "n_view", None))
    bi, bw = epoch_batches_grouped(tr, data.graph_idx, batch_size,
                                   np.random.default_rng(0))
    key = jax.random.PRNGKey(1)

    def run():
        _, _, loss = train_epoch(params, opt_state, d, bi, bw, key)
        return float(np.asarray(loss))  # full host readback (CLAUDE.md)

    run()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best, int(bi.shape[0]), conn.kind


def measure_ensemble_epoch_speedup(graph, K: int = 4, hidden: int = 8,
                                   repeats: int = 3):
    """Per-epoch speedup of folding the K-repeat protocol into ONE vmapped
    program (train/ensemble.py) vs K sequential whole-epoch programs, at
    the protocol's dispatch-bound config (hidden=8, batch_size=1, 120
    steps — ``monitorer-sim.py`` hidden_dim_array=[8,8,8,8]). Compile time
    is excluded on both sides (the persistent executable cache amortizes
    it across protocol runs), so this is the steady-state epoch economics
    behind the 2.37x protocol wall win (RESULTS.md round 4c). Returns
    ``(speedup, seq_epoch_s, ens_epoch_s)`` where
    ``speedup = K * seq_epoch_s / ens_epoch_s``.
    """
    import jax

    from gn_ode_sir_tpu.train import init_ensemble
    from gn_ode_sir_tpu.train.loop import make_train_epoch_fn, train_epoch_body

    model, optimizer, d, adj_fn, bi, bw = _bench_trial_setup(graph, hidden)

    def _best(run):
        run()  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    # sequential: the same compiled epoch a worker repeat dispatches
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    seq_epoch = make_train_epoch_fn(model, optimizer, adj_fn)
    key = jax.random.PRNGKey(1)

    def run_seq():
        p, _, loss = seq_epoch(params, opt_state, d, bi, bw, key)
        return float(np.asarray(loss)) + float(
            np.asarray(jax.tree_util.tree_leaves(p)[0]).sum())

    seq_s = _best(run_seq)

    # ensemble: K members' epochs as one vmapped program (the routing
    # fit_ensemble takes for non-plan-stacked connectivity)
    stack = init_ensemble(model, list(range(K)))
    opt_stack = jax.vmap(optimizer.init)(stack)
    _tr = train_epoch_body(model, optimizer, adj_fn)
    ens_epoch = jax.jit(jax.vmap(_tr, in_axes=(0, 0, None, 0, 0, 0)))
    bik = np.broadcast_to(bi, (K, *bi.shape))
    bwk = np.broadcast_to(bw, (K, *bw.shape))
    keys = jax.random.split(jax.random.PRNGKey(2), K)

    def run_ens():
        p, _, loss = ens_epoch(stack, opt_stack, d, bik, bwk, keys)
        return float(np.asarray(loss).sum()) + float(
            np.asarray(jax.tree_util.tree_leaves(p)[0]).sum())

    ens_s = _best(run_ens)
    return K * seq_s / ens_s, seq_s, ens_s


SERVE_CKPT = os.path.join(
    ROOT, "results", "ngraphs_r3",
    "ckpt-trial1-ode_nn-mg-dolphins-fb-food-fb-social-openflights-wiki-vote")


def measure_serving_summary(batch: int = 8, repeats: int = 3,
                            graph_name: str = "enron"):
    """Summary-only serving throughput on the COMMITTED transfer checkpoint
    (wv-unseen protocol run, hidden=8) scoring enron — the production fast
    path ``cli/infer.py --summary_only``: one jitted dispatch, device-side
    reduction, [B, 3] readback. Returns ``(scenarios_per_sec, best_wall_s,
    first_call_s)``; the first call pays compile (persistent cache
    applies), warm walls are best-of-``repeats``.
    """
    from gn_ode_sir_tpu.cli import infer
    from gn_ode_sir_tpu.cli.worker import build_model_and_adj
    from gn_ode_sir_tpu.graphs import load_graph

    g = load_graph(os.path.join(GRAPHS, graph_name))
    iargs = infer.build_parser().parse_args([
        "--ckpt", SERVE_CKPT, "--dataset", os.path.join(GRAPHS, graph_name),
        "--model", "ode_nn", "--hidden", "8", "--I_indices", "x",
    ])
    model, adj = build_model_and_adj(iargs, g, batch_size=batch)
    params = infer.restore_params(SERVE_CKPT)
    rng = np.random.RandomState(0)
    seeds = [sorted(rng.choice(g.n_nodes, 2, replace=False).tolist())
             for _ in range(batch)]
    beta = rng.uniform(0.1, 0.5, batch).astype(np.float32)
    gamma = rng.uniform(0.1, 0.5, batch).astype(np.float32)
    s0, i0, r0, beta, gamma = infer.scenario_batch(g.n_nodes, seeds, beta, gamma)

    t0 = time.perf_counter()
    infer.predict_summaries(model, params, adj, s0, i0, r0, beta, gamma)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        infer.predict_summaries(model, params, adj, s0, i0, r0, beta, gamma)
        best = min(best, time.perf_counter() - t0)
    return batch / best, best, first


def _phase(msg: str) -> None:
    """Heartbeat to stderr (stdout stays the one JSON line). The retry
    wrapper's no-output watchdog keys off these: without them the child is
    silent for the whole run and the watchdog window would measure total
    runtime instead of actual stall time."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    _phase("loading graphs")
    graph = load_graph(os.path.join(GRAPHS, "openflights"))
    wiki = load_graph(os.path.join(GRAPHS, "wiki-vote"))

    baseline = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)
    baseline_dirty = False
    if "value" not in baseline:
        baseline_dirty = True
        _phase("measuring reference sim proxy (torch CPU, cold cache only)")
        baseline["metric"] = "mc_sir_sims_per_sec_openflights"
        baseline["value"] = _reference_proxy_sims_per_sec(graph)
        baseline["method"] = (
            "reference sir_torch algorithm (per-sim Python loop, torch CPU), "
            "20 sims extrapolated"
        )
    if "train_epoch_s" not in baseline:
        baseline_dirty = True
        _phase("measuring reference train proxy (torch CPU, cold cache only)")
        karate = load_graph(os.path.join(GRAPHS, "karate"))
        proxies = {}
        for name, g, probes in (
            ("karate", karate, 5), ("openflights", graph, 3), ("wiki-vote", wiki, 2),
        ):
            step_s = _reference_proxy_train_step_s(g, n_probe=probes)
            proxies[name] = {
                "step_s": step_s,
                "epoch_s": step_s * TRAIN_STEPS_PER_EPOCH,
            }
        baseline["train_epoch_s"] = proxies
        baseline["train_method"] = (
            "reference ode_nn_ngraph_sim training-step algorithm (torch CPU, "
            "per-f-eval scipy block_diag rebuild, scatter_add SpMM, euler x40, "
            "direct autograd in place of the costlier adjoint solve), "
            "epoch = 120 steps at batch_size=1"
        )
    if baseline_dirty:
        # persist whenever EITHER proxy was (re)measured — writing only on
        # the train-proxy branch let a cache with train_epoch_s but no
        # 'value' re-pay the multi-minute sim proxy on every run
        with open(BASELINE_CACHE, "w") as f:
            json.dump(baseline, f, indent=2)

    _phase("measuring MC sim throughput (openflights)")
    sims_per_sec, best_s = measure_ours(graph)
    vs = sims_per_sec / baseline["value"]

    _phase("measuring GNODE train epoch (wiki-vote)")
    epoch_s = measure_ours_train_epoch(wiki)
    ref_epoch_s = baseline["train_epoch_s"]["wiki-vote"]["epoch_s"]
    vs_train = ref_epoch_s / epoch_s

    _phase("measuring SpMM apply (wiki-vote)")
    spmm_s = measure_spmm_apply(wiki)

    # best-effort (GN_BENCH_MG=0 skips): the enron-scale multigraph train
    # epoch — round 4's flagship perf win (3.77 s r3 -> per-graph grids ->
    # node view). A failure here (e.g. transient RESOURCE_EXHAUSTED at this
    # scale) must not cost the headline metrics.
    mg_epoch_s = mg_steps = mg_kind = None
    if os.environ.get("GN_BENCH_MG", "1").strip().lower() not in (
            "0", "false", "off", "no"):
        try:
            _phase("measuring multigraph train epoch (enron config)")
            mg_epoch_s, mg_steps, mg_kind = measure_mg_epoch()
        except Exception as e:  # noqa: BLE001 — extra metric is best-effort
            print(f"mg-epoch metric skipped: {e!r}", file=sys.stderr,
                  flush=True)

    # best-effort (GN_BENCH_ENS=0 skips): per-epoch speedup of the vmapped
    # K=4 repeat protocol at hidden=8 — round 4c's ensemble claim, made
    # driver-capturable.
    ens_speedup = ens_seq_s = ens_ens_s = None
    if os.environ.get("GN_BENCH_ENS", "1").strip().lower() not in (
            "0", "false", "off", "no"):
        try:
            _phase("measuring ensemble epoch speedup (wiki-vote, h=8, K=4)")
            ens_speedup, ens_seq_s, ens_ens_s = \
                measure_ensemble_epoch_speedup(wiki)
        except Exception as e:  # noqa: BLE001 — extra metric is best-effort
            print(f"ensemble metric skipped: {e!r}", file=sys.stderr,
                  flush=True)

    # best-effort (GN_BENCH_SERVE=0 skips): summary-only serving throughput
    # on the committed transfer checkpoint (round 4d surface).
    serve_sps = serve_best_s = serve_first_s = None
    # batch 64 = the measured dispatch-amortization knee (RESULTS.md §5b);
    # larger sweeps chunk to 64-wide dispatches at the same throughput
    serve_batch, serve_graph = 64, "enron"
    if os.environ.get("GN_BENCH_SERVE", "1").strip().lower() not in (
            "0", "false", "off", "no"):
        try:
            _phase("measuring summary-only serving (enron, committed ckpt)")
            serve_sps, serve_best_s, serve_first_s = measure_serving_summary(
                batch=serve_batch, graph_name=serve_graph)
        except Exception as e:  # noqa: BLE001 — extra metric is best-effort
            print(f"serving metric skipped: {e!r}", file=sys.stderr,
                  flush=True)

    # absolute utilization vs the v5e roofline (modeled FLOPs/bytes from
    # shapes; both bounds reported — see utils/roofline.py)
    from gn_ode_sir_tpu.utils.roofline import (
        gnode_train_epoch_model,
        mc_sim_model,
        spmm_apply_model,
        utilization,
    )

    util_sim = utilization(
        mc_sim_model(graph.n_nodes, SIMS, MAX_TIME), best_s
    )
    util_train = utilization(
        gnode_train_epoch_model(
            wiki.n_nodes, HIDDEN, BATCH, TRAIN_STEPS_PER_EPOCH,
            int(MAX_TIME / DELTA_T),
        ),
        epoch_s,
    )
    util_spmm = utilization(
        spmm_apply_model(wiki.n_nodes, len(wiki.src), HIDDEN), spmm_s
    )

    details = {
        "headline": {
            "graph": "openflights",
            "sims": SIMS,
            "max_time": MAX_TIME,
            "best_wall_s": best_s,
            "sims_per_sec": sims_per_sec,
            "vs_baseline": vs,
            "utilization": util_sim,
        },
        "gnode_train_epoch_wikivote": {
            "hidden": HIDDEN,
            "batch_size": BATCH,
            "steps_per_epoch": TRAIN_STEPS_PER_EPOCH,
            "epoch_s": epoch_s,
            "reference_proxy_epoch_s": ref_epoch_s,
            "vs_baseline": vs_train,
            "utilization": util_train,
        },
        "spmm_apply_wikivote": {
            "hidden": HIDDEN,
            "backend": "pallas2 (TPU) / ell (CPU)",
            "per_apply_s": spmm_s,
            "utilization": util_spmm,
        },
        "baseline_proxy": baseline,
    }
    if mg_epoch_s is not None:
        details["gnode_mg_train_epoch_enron"] = {
            "graphs": "dolphins+fb-food+fb-social+openflights+wiki-vote+enron",
            "hidden": 8,
            "batch_size": 8,
            "steps_per_epoch": mg_steps,
            "backend": mg_kind,
            "epoch_s": mg_epoch_s,
            # round-3 shipped epoch (padded single grid, full-width train):
            # the within-framework baseline this round's levers cut from
            "r3_epoch_s": R3_MG_EPOCH_S,
            "vs_r3": R3_MG_EPOCH_S / mg_epoch_s,
        }
    if ens_speedup is not None:
        details["ensemble_epoch_speedup_wikivote"] = {
            "K": 4, "hidden": 8, "batch_size": BATCH,
            "steps_per_epoch": TRAIN_STEPS_PER_EPOCH,
            "seq_epoch_s": ens_seq_s, "ensemble_epoch_s": ens_ens_s,
            # K * seq / ens: walltime ratio of K sequential epochs vs the
            # one vmapped K-member epoch (steady state, compiles excluded)
            "speedup": ens_speedup,
        }
    if serve_sps is not None:
        details["serving_summary_only_enron"] = {
            "ckpt": os.path.relpath(SERVE_CKPT, ROOT),
            "batch": serve_batch, "hidden": 8, "graph": serve_graph,
            "first_call_s": serve_first_s,
            "best_wall_s": serve_best_s,
            "scenarios_per_sec": serve_sps,
        }
    try:
        import jax

        details["device"] = str(jax.devices()[0])
    except Exception:
        pass
    with open(DETAILS, "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "mc_sir_sims_per_sec_openflights",
        "value": round(sims_per_sec, 1),
        "unit": "sims/s",
        "vs_baseline": round(vs, 2),
        "mfu": round(util_sim["mfu"], 4),
        "hbm_frac": round(util_sim["hbm_frac"], 4),
        "extra_metrics": [{
            "metric": "gnode_train_epoch_s_wikivote",
            "value": round(epoch_s, 4),
            "unit": "s/epoch",
            "vs_baseline": round(vs_train, 2),
            "mfu": round(util_train["mfu"], 4),
            "hbm_frac": round(util_train["hbm_frac"], 4),
        }, {
            "metric": "spmm_apply_ms_wikivote",
            "value": round(spmm_s * 1e3, 4),
            "unit": "ms/apply",
            "vs_baseline": None,
            "mfu": round(util_spmm["mfu"], 4),
            "hbm_frac": round(util_spmm["hbm_frac"], 4),
        }] + ([{
            "metric": "gnode_mg_train_epoch_s_enron",
            "value": round(mg_epoch_s, 4),
            "unit": "s/epoch",
            # no reference proxy exists at this scale (the reference's
            # torch-CPU ngraphs step with per-f-eval block_diag would take
            # hours/epoch on enron); ratio vs OUR round-3 shipped epoch
            "vs_baseline": None,
            "vs_r3": round(R3_MG_EPOCH_S / mg_epoch_s, 2),
        }] if mg_epoch_s is not None else []) + ([{
            "metric": "ensemble_epoch_speedup_wikivote_h8_k4",
            "value": round(ens_speedup, 2),
            "unit": "x",
            # within-framework ratio (K sequential epochs / one vmapped
            # K-member epoch); no reference analogue — the reference runs
            # repeats as separate processes
            "vs_baseline": None,
        }] if ens_speedup is not None else []) + ([{
            "metric": "serving_summary_scenarios_per_sec_enron",
            "value": round(serve_sps, 2),
            "unit": "scenarios/s",
            # no reference analogue: the reference has no serving path
            "vs_baseline": None,
        }] if serve_sps is not None else []),
    }))


# Errors that indicate a transient tunnel/chip-claim outage (CLAUDE.md:
# a SIGTERMed stall can wedge the remote claim; each new client then fails
# with UNAVAILABLE after ~25 min until the claim expires). Same failure
# mode monitorer --retry was built for; BENCH_r03.json died to it.
_RETRYABLE = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "TPU worker crashed or restarted",
    "DEADLINE_EXCEEDED",
)


def _pump(src, dst, buf, last=None):
    """Stream a child pipe through live (so `tail -f` on a nohup log shows
    progress — TPU compiles/stalls look like hangs, CLAUDE.md) while keeping
    a copy for the retry-eligibility check."""
    for line in iter(src.readline, ""):
        dst.write(line)
        dst.flush()
        buf.append(line)
        if last is not None:
            last["t"] = time.monotonic()
    src.close()


def _main_with_retries() -> int:
    """Run the measurement in a child process, retrying transient TPU
    outages with backoff. The child is its own availability probe (it
    exits nonzero by itself when the backend is unavailable); nothing
    here kills a TPU client — a wedged claim recovers on its own and
    killing the client extends the wedge (CLAUDE.md)."""
    import signal
    import threading

    retries = int(os.environ.get("GN_BENCH_RETRIES", "4"))
    wait_s = float(os.environ.get("GN_BENCH_RETRY_WAIT", "300"))
    # A wedged child can also HANG with no output forever (observed: a
    # client that never got past backend init). The measurement child
    # heartbeats between phases (main()::_phase), so the watchdog window
    # bounds ONE silent phase, not the whole run — it must still exceed the
    # worst legitimate case: a ~55 min self-healing mid-run tunnel stall
    # (CLAUDE.md — never reap earlier) plus the longest single phase. Past
    # that, the child is dead weight: reap it (plain SIGTERM, never -9) and
    # let the retry loop take over.
    stall_s = float(os.environ.get("GN_BENCH_STALL_TIMEOUT", "5400"))

    # If an outer `timeout`/driver SIGTERMs this wrapper, pass a plain
    # SIGTERM (never SIGKILL — CLAUDE.md) to the live child instead of
    # orphaning a TPU client that would silently hold the chip, and STOP
    # retrying. Installed before the first spawn so no delivery window can
    # hit the default disposition while a child is alive.
    state = {"proc": None, "stop": False}

    def _on_term(*_):
        state["stop"] = True
        if state["proc"] is not None:
            state["proc"].terminate()

    prev = signal.signal(signal.SIGTERM, _on_term)
    try:
        for attempt in range(1, retries + 1):
            if state["stop"]:
                return 143
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--once"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            state["proc"] = proc
            if state["stop"]:
                # SIGTERM landed between Popen returning and the assignment
                # above — the handler saw proc=None and terminated nothing
                proc.terminate()
            out_buf: list = []
            err_buf: list = []
            last = {"t": time.monotonic()}
            hung = {"v": False}
            threads = [
                threading.Thread(target=_pump,
                                 args=(proc.stdout, sys.stdout, out_buf, last)),
                threading.Thread(target=_pump,
                                 args=(proc.stderr, sys.stderr, err_buf, last)),
            ]
            for t in threads:
                t.start()

            def _watch(p=proc, last=last, hung=hung):
                poll = getattr(p, "poll", None)
                if poll is None:  # test doubles without poll() complete synchronously
                    return
                while poll() is None:
                    time.sleep(min(5.0, max(stall_s / 4, 0.05)))
                    if state["stop"] or poll() is not None:
                        return
                    if time.monotonic() - last["t"] > stall_s:
                        hung["v"] = True
                        print(
                            f"[bench] no child output for {stall_s:.0f}s — "
                            "reaping the stalled client and retrying",
                            file=sys.stderr,
                        )
                        p.terminate()
                        return

            threading.Thread(target=_watch, daemon=True).start()
            proc.wait()
            for t in threads:
                t.join()
            state["proc"] = None
            if proc.returncode == 0:
                return 0
            if state["stop"]:
                # forwarded termination — do NOT spawn another TPU client
                return proc.returncode or 143
            tail = ("".join(out_buf) + "".join(err_buf))[-6000:]
            retryable = hung["v"] or any(pat in tail for pat in _RETRYABLE)
            print(
                f"[bench] attempt {attempt}/{retries} rc={proc.returncode} "
                f"retryable={retryable}", file=sys.stderr,
            )
            if not retryable or attempt == retries:
                return proc.returncode or 1
            time.sleep(wait_s)
        return 1
    finally:
        signal.signal(signal.SIGTERM, prev)


if __name__ == "__main__":
    if "--once" in sys.argv:
        main()
    else:
        sys.exit(_main_with_retries())
