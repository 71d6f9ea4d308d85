"""Measure the vmapped-ensemble trainer (train/ensemble.py) on hardware.

The reference's repeat protocol runs K identical-config workers
sequentially (``monitorer-ngraphs.py:20`` hidden_dim_array=[8,8,8,8]), so
the 4-repeat matrix costs 4x the compile and 4x the wall of one run. The
TPU-native answer is the vmapped member axis: this probe times, at the
canonical wiki-vote train-epoch config bench.py uses (hidden 64, batch 1,
120 steps/epoch, maxTime 20), the SAME whole-epoch program

  (a) single-member (the bench harness, K sequential runs cost K of these)
  (b) K-member vmapped (fit_ensemble's compiled epoch), K in {2, 4, 8}

and reports per-member epoch time + the implied 4-repeat protocol speedup.
Timing protocol per CLAUDE.md: full host readback, best-of-N.

Run on the TPU:  nohup python -u scripts/probe_ensemble.py > runs_r4/probe_ensemble.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from gn_ode_sir_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from gn_ode_sir_tpu.graphs import load_graph  # noqa: E402
from gn_ode_sir_tpu.models import GNODE  # noqa: E402
from gn_ode_sir_tpu.models.gnode import solver_policy  # noqa: E402
from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph  # noqa: E402
from gn_ode_sir_tpu.train import TrialData, init_ensemble  # noqa: E402
from gn_ode_sir_tpu.train.loop import (  # noqa: E402
    _data_to_device,
    make_train_epoch_fn,
    train_epoch_body,
)

GRAPHS = os.environ.get(
    "GN_ODE_SIR_DATA_ROOT", os.path.join(os.path.dirname(__file__), "..", "..", "reference")
)
HIDDEN = int(os.environ.get("GN_PROBE_HIDDEN", "64"))
BATCH, MAX_TIME, DELTA_T, STEPS = 1, 20, 0.5, 120
REPEATS = int(os.environ.get("GN_PROBE_REPEATS", "6"))


def build(graph):
    n = graph.n_nodes
    rng = np.random.default_rng(0)
    n_distinct = 8
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
    adjoint, unroll = solver_policy(n, HIDDEN, BATCH, MAX_TIME, DELTA_T)
    model = GNODE(hidden=HIDDEN, max_time=MAX_TIME, delta_t=DELTA_T,
                  adjoint=adjoint, solver_unroll=unroll)
    optimizer = optax.adam(1e-4)
    d = _data_to_device(data)
    d["__adj_aux__"] = {"adj": adjacency_from_graph(graph)}
    bi = (np.arange(STEPS, dtype=np.int32) % n_distinct)[:, None]
    bw = np.ones((STEPS, BATCH), np.float32)
    return model, optimizer, d, bi, bw


def best_of(fn, repeats=REPEATS):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    name = os.environ.get("GN_PROBE_GRAPH", "wiki-vote")
    graph = load_graph(os.path.join(GRAPHS, "real_graphs", name))
    model, optimizer, d, bi, bw = build(graph)
    adj_fn = lambda gi, aux: aux["adj"]  # noqa: E731

    results = {}

    # (a) single member — identical to bench.py::measure_ours_train_epoch
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    train_epoch = make_train_epoch_fn(model, optimizer, adj_fn)
    key = jax.random.PRNGKey(1)

    def run_single():
        p, o, loss = train_epoch(params, opt_state, d, bi, bw, key)
        return float(np.asarray(loss)) + float(
            np.asarray(jax.tree_util.tree_leaves(p)[0]).sum())

    t1 = best_of(run_single)
    results["single"] = t1
    print(f"single-member epoch: {t1:.4f} s", flush=True)

    # (b) K-member vmapped epochs
    for K in (2, 4, 8):
        seeds = list(range(K))
        stack = init_ensemble(model, seeds)
        opt_stack = jax.vmap(optimizer.init)(stack)
        ens_epoch = jax.jit(jax.vmap(
            train_epoch_body(model, optimizer, adj_fn),
            in_axes=(0, 0, None, 0, 0, 0),
        ))
        bik = np.broadcast_to(bi, (K,) + bi.shape)
        bwk = np.broadcast_to(bw, (K,) + bw.shape)
        keys = jax.vmap(jax.random.fold_in, (0, None))(
            jnp.stack([jax.random.PRNGKey(s + 1) for s in seeds]), 0)

        def run_ens():
            p, o, loss = ens_epoch(stack, opt_stack, d, bik, bwk, keys)
            return float(np.asarray(loss).sum()) + float(
                np.asarray(jax.tree_util.tree_leaves(p)[0]).sum())

        tk = best_of(run_ens)
        results[f"K{K}"] = tk
        print(f"K={K} vmapped epoch: {tk:.4f} s "
              f"({tk / K:.4f} s/member, {t1 * K / tk:.2f}x vs {K} sequential)",
              flush=True)

    s4 = results.get("K4", float("nan"))
    summary = {
        "hidden": HIDDEN,
        "single_epoch_s": results["single"],
        "ens_epoch_s": {k: v for k, v in results.items() if k != "single"},
        "protocol4_speedup": results["single"] * 4 / s4,
        "per_member_K4_s": s4 / 4,
    }
    print(json.dumps(summary), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "runs_r4",
                       f"probe_ensemble_h{HIDDEN}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
