"""Round-5 serving probes: warm-cache first-call bound + batch scaling.

Two questions left open by round 4 (VERDICT r4 weak #3, next #2/#8):

1. **What does a production cold start cost?** ``cli/infer.py`` enables the
   persistent executable cache; nothing proved a cold PROCESS with a warm
   cache serves in seconds. This probe's FIRST dispatch is that
   measurement: run the script twice back-to-back — the second process is
   guaranteed warm-cache and its ``first_summary_call_s`` /
   ``first_full_call_s`` are the serving surface's true cold-start bound.
2. **Where does dispatch amortize?** Round 4 shipped one summary-only
   point (4.2 scenarios/s at batch 8). Sweep batch 8 -> 64 -> 256 to find
   the scenarios/s knee (same design rule as ``simulate_sir_many``'s
   batched trials).

Usage (TPU; run TWICE, second run = warm-cache proof):
  nohup python -u scripts/probe_serving_r5.py --tag cold \
      > runs_r5/probe_serving_r5_cold.log 2>&1 &
  # after it exits:
  nohup python -u scripts/probe_serving_r5.py --tag warm \
      > runs_r5/probe_serving_r5_warm.log 2>&1 &
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


def _scenarios(g, batch, seed=0):
    from gn_ode_sir_tpu.cli import infer

    rng = np.random.RandomState(seed)
    seeds = [sorted(rng.choice(g.n_nodes, 2, replace=False).tolist())
             for _ in range(batch)]
    beta = rng.uniform(0.1, 0.5, batch).astype(np.float32)
    gamma = rng.uniform(0.1, 0.5, batch).astype(np.float32)
    return infer.scenario_batch(g.n_nodes, seeds, beta, gamma)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=DEFAULT_CKPT)
    ap.add_argument("--graph", default="enron")
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 64, 256],
                    help="sweep points; entries whose single-dispatch "
                         "activation estimate exceeds the HBM cap run "
                         "chunked via predict_summaries(dispatch_batch=...)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tag", default="cold")
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

    t_start = time.perf_counter()
    g = load_graph(f"./real_graphs/{args.graph}")
    print(f"[serve-r5] graph {g.name}: {g.n_nodes} nodes, {g.n_edges} edges",
          flush=True)

    b0 = args.batches[0]
    iargs = infer.build_parser().parse_args([
        "--ckpt", args.ckpt, "--dataset", f"./real_graphs/{args.graph}",
        "--model", "ode_nn", "--hidden", "8", "--I_indices", "x",
    ])
    model, adj = build_model_and_adj(iargs, g, batch_size=b0)
    params = infer.restore_params(args.ckpt)
    setup_s = time.perf_counter() - t_start
    print(f"[serve-r5] setup (load+restore): {setup_s:.1f} s", flush=True)

    # FIRST dispatch of the process — with a warm persistent cache this is
    # the production cold-start number (trace + cache-hit load + run)
    s0, i0, r0, beta, gamma = _scenarios(g, b0)
    t0 = time.perf_counter()
    rows = infer.predict_summaries(model, params, adj, s0, i0, r0, beta, gamma)
    first_summary = time.perf_counter() - t0
    print(f"[serve-r5] first summary call (b={b0}): {first_summary:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    out = infer.predict_scenarios(model, params, adj, s0, i0, r0, beta, gamma)
    _ = float(np.asarray(out).sum())
    first_full = time.perf_counter() - t0
    print(f"[serve-r5] first full-trajectory call (b={b0}): {first_full:.1f} s",
          flush=True)

    # batch-scaling sweep, summary-only (the production fast path). The
    # forward trajectory costs ~(n_steps+1)*n*3*h*4 bytes per scenario
    # (models/gnode.py:169 stacks [T, B, n, 3, h]); cap single dispatches
    # at ~9 GB of that estimate and run bigger sweep points chunked — the
    # production shape for beyond-HBM scenario matrices.
    n_steps = int(round(20 / 0.5))
    per_scn = (n_steps + 1) * g.n_nodes * 3 * 8 * 4
    cap = int(9e9)
    max_single = max(1, cap // per_scn)
    if max_single >= 8:  # align chunk shapes to a multiple of 8
        max_single = (max_single // 8) * 8
    sweep = []
    for b in args.batches:
        chunk = None if b <= max_single else max_single
        sb = _scenarios(g, b, seed=b)
        try:
            t0 = time.perf_counter()
            infer.predict_summaries(model, params, adj, *sb,
                                    dispatch_batch=chunk)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                infer.predict_summaries(model, params, adj, *sb,
                                        dispatch_batch=chunk)
                walls.append(time.perf_counter() - t0)
            best = min(walls)
            row = {
                "batch": b,
                "dispatch_batch": chunk,
                "first_call_s": round(compile_s, 2),
                "warm_wall_s": [round(w, 4) for w in walls],
                "best_wall_s": round(best, 4),
                "scenarios_per_sec": round(b / best, 1),
            }
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row = {"batch": b, "dispatch_batch": chunk, "error": repr(e)[:300]}
        sweep.append(row)
        print(json.dumps(row), flush=True)

    result = {
        "tag": args.tag,
        "graph": g.name, "n_nodes": g.n_nodes, "n_edges": g.n_edges,
        "ckpt": os.path.relpath(args.ckpt, REPO),
        "setup_s": round(setup_s, 2),
        "first_summary_call_s": round(first_summary, 2),
        "first_full_call_s": round(first_full, 2),
        "summary_head": rows[:2],
        "batch_sweep": sweep,
        "backend": jax.default_backend(),
    }
    out_path = os.path.join(REPO, "runs_r5",
                            f"probe_serving_r5_{args.tag}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
