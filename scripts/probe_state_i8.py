"""A/B the int8 state carry below the 4096-node threshold, post I/R-drop.

The >=4096-node gate on ``state_i8`` was measured in round 2 with the full
(S, I, R) f32 carry; dropping S changed the traffic mix, so re-measure at
openflights (2,905 n — below the gate) with the current rbg16 default.

Usage: PYTHONPATH=/root/repo python scripts/probe_state_i8.py
"""
from __future__ import annotations

import json
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def best_of(fn, repeats=8):
    fn()  # compile / warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.sim.mc_sir import _device_adjacency, _simulate_chunk

    print("device:", jax.devices()[0])
    sims, T = 10_000, 20
    out = {}
    for name in ("openflights", "wiki-vote"):
        g = load_graph(f"{GRAPHS}/{name}")
        a8 = _device_adjacency(g, jnp.int8)
        mask = np.zeros(g.n_nodes, np.float32)
        mask[[0, 5]] = 1.0
        mask = jnp.asarray(mask)
        key = jax.random.PRNGKey(1)
        row = {}
        for s_i8 in (False, True):
            def run(s_i8=s_i8):
                ir = _simulate_chunk(
                    a8, mask, 0.3, 0.2, key, sims=sims, max_time=T,
                    coins="rbg16", state_i8=s_i8, out_u16=True,
                )
                return float(np.asarray(ir, dtype=np.float32).sum())

            best = best_of(run)
            row[f"state_i8={s_i8}"] = {
                "best_s": best, "sims_per_sec": sims / best,
            }
            print(name, f"state_i8={s_i8}", f"{sims / best:,.0f} sims/s")
        out[name] = row
    print(json.dumps(out, indent=1))
    with open("runs_r3/state_i8_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
