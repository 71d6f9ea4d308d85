"""Measure batched multi-trial label extraction vs the sequential loop on
hardware: 16 openflights trials, 10k sims each, best of 3 full passes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_batch_extract.py
"""
from __future__ import annotations

import json
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def main():
    import jax

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.sim import simulate_sir_counts, simulate_sir_counts_many
    from gn_ode_sir_tpu.sim.mc_sir import _auto_trials_chunk

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
    print("auto trials_chunk:", _auto_trials_chunk(g.n_nodes, sims, True))
    out = {}

    def seq():
        acc = 0.0
        for j, (sn, b, ga) in enumerate(trials):
            acc += float(simulate_sir_counts(
                g, sn, b, ga, sims=sims, max_time=T, key=keys[j]).sum())
        return acc

    def bat():
        res = simulate_sir_counts_many(
            g, trials, sims=sims, max_time=T, keys=keys)
        return float(sum(r.sum() for r in res))

    for name, fn in (("sequential", seq), ("batched", bat)):
        fn()  # compile/warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "best_s": best,
            "trials_per_sec": ntr / best,
            "sims_per_sec_aggregate": ntr * sims / best,
        }
        print(name, out[name])
    out["speedup"] = out["sequential"]["best_s"] / out["batched"]["best_s"]
    print(json.dumps(out, indent=1))
    with open("runs_r3/batch_extract_openflights.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
