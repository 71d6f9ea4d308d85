"""MC-simulator coin-mode shoot-out on real hardware (VERDICT r1 item 4b).

Round 1: the fused hardware-PRNG kernel (coins='pallas',
``sim/pallas_step.py``) never ran on the chip — the remote compile service
returned HTTP 500. This script retries it and times every coin mode with
full host readbacks, recording the result either way.

Usage: python scripts/bench_sim_coins.py [--graph wiki-vote] [--sims 10000]
"""

from __future__ import annotations

import argparse
import json
import time
import traceback

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def main():
    import jax

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.sim import simulate_sir

    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="wiki-vote")
    ap.add_argument("--sims", type=int, default=10000)
    ap.add_argument("--modes", nargs="+",
                    default=["bits16", "bits32", "uniform", "pallas"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    print("device:", jax.devices()[0])
    g = load_graph(f"{GRAPHS}/{args.graph}")
    results = {}
    ref = None
    for mode in args.modes:
        try:
            t0 = time.perf_counter()
            out = simulate_sir(g, [0, 5], 0.3, 0.2, sims=args.sims,
                               key=jax.random.PRNGKey(0), coins=mode)
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for r in range(args.repeats):
                t0 = time.perf_counter()
                out = simulate_sir(g, [0, 5], 0.3, 0.2, sims=args.sims,
                                   key=jax.random.PRNGKey(r + 1), coins=mode)
                best = min(best, time.perf_counter() - t0)
            i_mean = np.stack(out)[1]
            if ref is None:
                ref = i_mean
                dev = 0.0
            else:
                dev = float(np.abs(i_mean - ref).mean())
            sps = args.sims / best
            results[mode] = {"sims_per_sec": sps, "best_s": best,
                             "compile_s": compile_s, "mean_dev_vs_bits16": dev}
            print(f"  {mode:8s}: {sps:10.0f} sims/s (best {best:.3f}s, "
                  f"compile {compile_s:.1f}s, |dI| vs first mode {dev:.4f})")
        except Exception as e:
            results[mode] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"  {mode:8s}: FAILED -> {type(e).__name__}: {str(e)[:200]}")
            traceback.print_exc(limit=2)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
