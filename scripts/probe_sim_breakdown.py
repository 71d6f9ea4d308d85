"""Decompose MC-sim wall time on hardware: tunnel floor, per-step cost,
matmul-only cost. Drives the next optimization decision with data.

Usage: PYTHONPATH=/root/repo python scripts/probe_sim_breakdown.py
"""
from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def best_of(fn, repeats=5):
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
    from gn_ode_sir_tpu.sim import simulate_sir
    from gn_ode_sir_tpu.sim.mc_sir import _device_adjacency

    print("device:", jax.devices()[0])
    g = load_graph(f"{GRAPHS}/openflights")
    n, sims, T = g.n_nodes, 10_000, 20
    out = {}

    # 1) tunnel floor: trivial jit producing the same-size output + readback
    @jax.jit
    def trivial(x):
        return x * 2.0

    x_small = jnp.zeros((T, 3, n), jnp.float32)
    out["tunnel_floor_s"] = best_of(
        lambda: float(np.asarray(trivial(x_small)).sum())
    )

    # 2) full sim at T=20 and T=2 (per-step marginal from the difference)
    for mt, name in ((20, "sim_T20_s"), (2, "sim_T2_s")):
        out[name] = best_of(
            lambda mt=mt: simulate_sir(
                g, [0, 5], 0.3, 0.2, sims=sims, max_time=mt,
                key=jax.random.PRNGKey(1), coins="rbg16",
            )
            and None
        )

    # 3) matmul-only scan: 19 chained int8 matmuls, no RNG/elementwise
    a8 = _device_adjacency(g, jnp.int8)

    @jax.jit
    def mm_only(i0, a):
        def body(i, _):
            c = jnp.dot(i, a, preferred_element_type=jnp.int32)
            return (c & 1).astype(jnp.int8), c.sum(dtype=jnp.int32)

        _, s = jax.lax.scan(body, i0, None, length=T - 1)
        return s

    i0 = jnp.zeros((sims, n), jnp.int8).at[:, :2].set(1)
    out["matmul_only_s"] = best_of(
        lambda: int(np.asarray(mm_only(i0, a8)).sum())
    )

    # 4) RNG-only scan: 19 rounds of rbg bits + compare + reduce
    @jax.jit
    def rng_only(key):
        rk = jax.random.wrap_key_data(jnp.concatenate([key, key]), impl="rbg")

        def body(c, t):
            w = jax.random.bits(jax.random.fold_in(rk, t), (sims, n),
                                jnp.uint32)
            u = (w & 0xFFFF).astype(jnp.float32)
            return c + u.sum(dtype=jnp.float32), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(T - 1))
        return s

    out["rng_only_s"] = best_of(
        lambda: float(np.asarray(rng_only(jax.random.PRNGKey(1))))
    )

    per_step = (out["sim_T20_s"] - out["sim_T2_s"]) / 18.0
    out["per_step_marginal_ms"] = per_step * 1e3
    out["per_step_matmul_ms"] = out["matmul_only_s"] / 19.0 * 1e3
    out["per_step_rng_ms"] = out["rng_only_s"] / 19.0 * 1e3
    print(json.dumps(out, indent=1))
    with open("runs_r3/sim_breakdown.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
