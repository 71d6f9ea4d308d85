"""SpMM backend shoot-out on real hardware (VERDICT r1 item 4).

Per-call timing through the axon tunnel is dominated by ~50 ms dispatch
noise, so each backend is timed as ONE jitted program that scans ``iters``
chained applications (y <- normalize(spmm(y))) — the per-application time is
wall / iters. Host readback forces completion.

Usage:  python scripts/bench_spmm.py [--graphs wiki-vote enron] [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def _chain(apply_fn, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def step(y, _):
            z = apply_fn(y)
            z = z / (jnp.abs(z).mean() + 1e-6)
            return z, ()

        y, _ = jax.lax.scan(step, x, None, length=iters)
        return y

    return run


def bench_backend(name, apply_fn, x, iters, repeats=3):
    run = _chain(apply_fn, iters)
    out = run(x)  # compile
    float(np.asarray(out).sum())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out).sum())  # full host readback
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"  {name:18s}: {per * 1e3:8.3f} ms/apply  ({best:.3f}s / {iters})")
    return per


def main():
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.ops.ell import EllAdj
    from gn_ode_sir_tpu.ops.pallas_spmm2 import SpmmPlan, spmm_pallas2
    from gn_ode_sir_tpu.ops.spmm import spmm_coo

    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", nargs="+", default=["wiki-vote", "enron"])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    print("device:", jax.devices()[0])
    results = {}
    for name in args.graphs:
        g = load_graph(f"{GRAPHS}/{name}")
        print(f"{name}: n={g.n_nodes} E(directed)={g.n_edges}")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((g.n_nodes, args.hidden)), jnp.float32)
        res = {}

        src = jnp.asarray(g.src)
        dst = jnp.asarray(g.dst)
        res["coo_segment_sum"] = bench_backend(
            "coo segment_sum", lambda y: spmm_coo(src, dst, y, g.n_nodes), x, args.iters
        )

        ell = EllAdj.from_graph(g)
        res["ell"] = bench_backend(
            "bucketed ELL", lambda y: ell.matvec(y[None])[0], x, args.iters
        )

        if g.n_nodes <= 10000:
            a = jnp.asarray(g.dense_adjacency, jnp.bfloat16)
            res["dense_bf16"] = bench_backend(
                "dense bf16 MXU",
                lambda y: jnp.dot(a, y.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32),
                x, args.iters,
            )

        interpret = jax.devices()[0].platform == "cpu"  # CPU smoke-test mode
        for K, R in ((512, 128), (1024, 256), (2048, 256), (2048, 512)):
            plan = SpmmPlan.build(g.src, g.dst, g.n_nodes, k_edges=K, r_rows=R)
            for prec in ("f32", "bf16"):
                res[f"pallas2_k{K}_r{R}_{prec}"] = bench_backend(
                    f"pallas2 K={K} R={R} {prec}",
                    lambda y, p=plan, q=prec: spmm_pallas2(
                        p, y, interpret=interpret, precision=q),
                    x, args.iters,
                )

        # gather-only probe: the XLA x[src] half of the pallas2 pipeline,
        # to localize whether gather or reduction dominates
        plan = SpmmPlan.build(g.src, g.dst, g.n_nodes, k_edges=1024, r_rows=256)
        sp = jnp.asarray(plan.src_padded)
        res["gather_only"] = bench_backend(
            "gather only", lambda y: y[sp].sum(0, keepdims=True) + y, x, args.iters
        )
        results[name] = res

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
