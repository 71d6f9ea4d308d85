"""Diagnose the batched-trials program: coins x trials_chunk grid vs the
sequential loop (openflights, 16 trials x 10k sims, best of 3).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_batch_variants.py
"""
from __future__ import annotations

import json
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def main():
    import jax

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.sim import simulate_sir_counts_many

    print("device:", jax.devices()[0])
    g = load_graph(f"{GRAPHS}/openflights")
    sims, T, ntr = 10_000, 20, 16
    rng = np.random.default_rng(0)
    trials = [
        ([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
         float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
        for _ in range(ntr)
    ]
    keys = [jax.random.PRNGKey(1000 + j) for j in range(ntr)]
    out = {}
    for coins in ("rbg16", "bits16"):
        for chunk in (4, 8, 16):
            def fn(coins=coins, chunk=chunk):
                res = simulate_sir_counts_many(
                    g, trials, sims=sims, max_time=T, keys=keys,
                    coins=coins, trials_chunk=chunk)
                return float(sum(r.sum() for r in res))

            fn()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            key = f"{coins}-chunk{chunk}"
            out[key] = {"best_s": best,
                        "sims_per_sec_aggregate": ntr * sims / best}
            print(key, out[key])
    print(json.dumps(out, indent=1))
    with open("runs_r3/batch_variants_openflights.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
