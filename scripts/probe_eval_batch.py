"""Probe: unseen-graph eval cost vs eval_batch_size on the enron ngraphs
protocol shapes (stacked-pallas2 multigraph backend).

The fit() loop evaluates the 60 unseen-enron val trials EVERY epoch
(reference protocol, ode_nn_ngraphs.py:198-264). With the batch-folded
pallas2 eval stack, one batch of B trials runs as ONE kernel pass of
message width B*h, and the SpMM gather is ADDRESS-bound (RESULTS.md SpMM
shoot-out: halving bytes barely moves it) — so folding all 60 trials into
one pass should cost far less than 8 passes of width 8*h. This measures
evaluate() wall time at several eval_batch_size values plus the train
epoch for scale, to pick the auto default.

Run ON TPU (one chip — make sure nothing else is running):
  nohup python -u scripts/probe_eval_batch.py > /tmp/probe_evalbs.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATASET = ("/root/reference/real_graphs/"
           "dolphins+fb-food+fb-social+openflights+wiki-vote+enron")
RUN_DIR = "runs_r3/ngraphs_enron"
COUNTS = [36, 36, 36, 36, 36, 120]


def main():
    import pickle

    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.graphs import load_graphs
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.train import (
        assemble_multigraph_trials,
        multigraph_pallas2_fns,
        multigraph_split,
    )
    from gn_ode_sir_tpu.train.data import epoch_batches_grouped
    from gn_ode_sir_tpu.train.loop import (
        _data_to_device,
        make_eval_fn,
        make_train_epoch_fn,
    )

    import optax

    graphs = load_graphs(DATASET)
    names = [g.name for g in graphs]
    label_dirs = [os.path.join(RUN_DIR, f"Experiments-seed2-{n}") for n in names]
    per_graph = []
    for g_i, d in enumerate(label_dirs):
        with open(os.path.join(d, "initial-seed.pkl"), "rb") as f:
            ii = pickle.load(f)
        with open(os.path.join(d, "initial-beta.pkl"), "rb") as f:
            bb = pickle.load(f)
        with open(os.path.join(d, "initial-gamma.pkl"), "rb") as f:
            gg = pickle.load(f)
        per_graph.append([(list(ii[k]), float(bb[k]), float(gg[k]))
                          for k in range(COUNTS[g_i])])
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, label_dirs=label_dirs, sim=10000, max_time=20,
        rng_key=jax.random.PRNGKey(0),
    )
    print(f"padded to n={batch.n_max}, e={batch.e_max}", flush=True)
    _, va, _ = multigraph_split(COUNTS)
    adj_fn, eval_adj_fn, node_mask_fn, adj_aux = multigraph_pallas2_fns(batch)
    model = GNODE(hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    evaluate = make_eval_fn(model, eval_adj_fn, node_mask_fn)
    d = _data_to_device(data)
    d["__adj_aux__"] = jax.tree_util.tree_map(jnp.asarray, adj_aux)

    # train epoch alone (23 folded steps at batch 8, protocol config) for
    # the eval-share denominator
    tr, _, _ = multigraph_split(COUNTS)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train_epoch = make_train_epoch_fn(model, optimizer, adj_fn, node_mask_fn)
    rng = np.random.default_rng(0)
    bi, bw = epoch_batches_grouped(tr, data.graph_idx, 8, rng)
    key = jax.random.PRNGKey(1)

    def run_train():
        p, o, loss = train_epoch(params, opt_state, d, bi, bw, key)
        return float(np.asarray(loss))

    run_train()
    best_tr = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_train()
        best_tr = min(best_tr, time.perf_counter() - t0)
    print(f"train epoch alone ({bi.shape[0]} steps, batch 8): {best_tr:.3f}s",
          flush=True)

    results = {"train_epoch_s": best_tr}
    for ebs in (8, 15, 30, 60):
        val_bi, val_bw = epoch_batches_grouped(va, data.graph_idx, ebs, None)
        t0 = time.perf_counter()
        v = float(evaluate(params, d, val_bi, val_bw))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(evaluate(params, d, val_bi, val_bw))
            best = min(best, time.perf_counter() - t0)
        results[ebs] = {"eval_s": best, "val": v, "compile_s": compile_s,
                        "n_batches": int(val_bi.shape[0])}
        print(f"ebs={ebs:3d}: {val_bi.shape[0]:2d} batches, eval {best:.3f}s "
              f"(compile {compile_s:.0f}s, val {v:.4f})", flush=True)
    with open("runs_r3/probe_eval_batch.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote runs_r3/probe_eval_batch.json", flush=True)


if __name__ == "__main__":
    main()
