"""Current simulator rates at wiki-vote and enron after the round-3
optimizations (I/R drop + rbg16 + unconditional int8 carry), including an
enron chunked-vs-unchunked A/B (the int8 carry shrinks the working set
enough that one dispatch may now hold the whole 10k x 33.7k state).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_sim_large.py
"""
from __future__ import annotations

import json
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def best_of(fn, repeats=5):
    fn()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.sim import simulate_sir

    print("device:", jax.devices()[0])
    sims, T = 10_000, 20
    out = {}
    cases = [
        ("wiki-vote", None),
        ("enron", 2500),
        ("enron", None),
    ]
    for name, chunk in cases:
        g = load_graph(f"{GRAPHS}/{name}")
        key = jax.random.PRNGKey(1)

        def run():
            simulate_sir(g, [0, 5], 0.3, 0.2, sims=sims, max_time=T,
                         key=key, sims_chunk=chunk)

        label = f"{name}-chunk{chunk}"
        try:
            best = best_of(run)
        except Exception as e:  # unchunked enron may OOM — record and go on
            out[label] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(label, "FAILED:", out[label])
            continue
        out[label] = {"best_s": best, "sims_per_sec": sims / best}
        print(label, out[label])
    print(json.dumps(out, indent=1))
    with open("runs_r3/sim_large_after_r3.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
