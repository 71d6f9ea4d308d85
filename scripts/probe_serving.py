"""Production-serving probe: what-if scenario latency on the real TPU.

Serves a committed transfer-trained GN-ODE checkpoint (the round-3/4
wiki-vote-unseen protocol run: trained on dolphins..openflights, hidden=8)
on a NEW graph through the serving path (`cli/infer.py` internals), and
times the scenario-sweep dispatch with the full-host-readback protocol
(CLAUDE.md: `block_until_ready` lies through the tunnel).

Usage (TPU, first compile may take minutes through the tunnel):
  nohup python -u scripts/probe_serving.py --graph enron --batch 8 \
      > runs_r4/probe_serving.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CKPT = os.path.join(
    REPO, "results/ngraphs_r3/"
    "ckpt-trial1-ode_nn-mg-dolphins-fb-food-fb-social-openflights-wiki-vote")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=DEFAULT_CKPT)
    ap.add_argument("--graph", default="enron")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "runs_r4/probe_serving.json"))
    args = ap.parse_args()

    from gn_ode_sir_tpu.cli import apply_data_root_default, infer
    from gn_ode_sir_tpu.cli.worker import build_model_and_adj
    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    apply_data_root_default()
    enable_persistent_compilation_cache()

    import jax

    from gn_ode_sir_tpu.graphs import load_graph

    g = load_graph(f"./real_graphs/{args.graph}")
    print(f"[serve] graph {g.name}: {g.n_nodes} nodes, {g.n_edges} directed edges",
          flush=True)

    # protocol architecture (monitorer-ngraphs defaults): hidden=8, euler,
    # deltaT=0.5, maxTime=20
    iargs = infer.build_parser().parse_args([
        "--ckpt", args.ckpt, "--dataset", f"./real_graphs/{args.graph}",
        "--model", "ode_nn", "--hidden", "8", "--I_indices", "x",
    ])
    model, adj = build_model_and_adj(iargs, g, batch_size=args.batch)
    params = infer.restore_params(args.ckpt)
    print(f"[serve] checkpoint restored from {args.ckpt}", flush=True)

    rng = np.random.RandomState(0)
    seeds = [sorted(rng.choice(g.n_nodes, 2, replace=False).tolist())
             for _ in range(args.batch)]
    beta = rng.uniform(0.1, 0.5, args.batch).astype(np.float32)
    gamma = rng.uniform(0.1, 0.5, args.batch).astype(np.float32)
    s0, i0, r0, beta, gamma = infer.scenario_batch(g.n_nodes, seeds, beta, gamma)

    t0 = time.perf_counter()
    out = infer.predict_scenarios(model, params, adj, s0, i0, r0, beta, gamma)
    first = time.perf_counter() - t0
    print(f"[serve] first call (compile + run): {first:.1f} s", flush=True)

    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = infer.predict_scenarios(model, params, adj, s0, i0, r0, beta, gamma)
        # full host readback — the only honest timing through the tunnel
        _ = float(np.asarray(out).sum())
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    rows = infer.summarize(np.transpose(out, (1, 0, 2, 3)))

    # summary-only serving: same compute, [B, 3] readback instead of the
    # full [T, B, n, 3] trajectory
    _ = infer.predict_summaries(model, params, adj, s0, i0, r0, beta, gamma)
    sum_walls = []
    for _i in range(args.repeats):
        t0 = time.perf_counter()
        _ = infer.predict_summaries(model, params, adj, s0, i0, r0, beta, gamma)
        sum_walls.append(time.perf_counter() - t0)
    best_sum = min(sum_walls)
    result = {
        "graph": g.name, "n_nodes": g.n_nodes, "n_edges": g.n_edges,
        "batch": args.batch, "ckpt": os.path.relpath(args.ckpt, REPO),
        "first_call_s": round(first, 2),
        "warm_wall_s": [round(w, 4) for w in walls],
        "best_wall_s": round(best, 4),
        "scenarios_per_sec": round(args.batch / best, 1),
        "summary_only_wall_s": [round(w, 4) for w in sum_walls],
        "summary_only_best_s": round(best_sum, 4),
        "summary_scenarios_per_sec": round(args.batch / best_sum, 1),
        "summary_head": rows[:2],
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
