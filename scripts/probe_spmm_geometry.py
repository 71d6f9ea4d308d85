"""Pallas2 SpMM chunk-geometry sweep (round 5).

With the chain=800 protocol the wiki-vote reading is ~0.95 ms/apply at <2%
of HBM bandwidth — the kernel is serialization-bound (sequential chunk
grid, C ~ E/K steps), so grid-step count and per-chunk matmul size are the
levers. Sweep (k_edges, r_rows) and message precision; dense-MXU rows for
context (the small-graph backend the train path already prefers under the
dense cutoff).

Usage (TPU):
  nohup python -u scripts/probe_spmm_geometry.py > runs_r5/probe_spmm_geometry.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRAPHS = "/root/reference/real_graphs"
HIDDEN = 64
CHAIN = 800


def _chain_run(apply_fn):
    # operand (dense matrix / plan arrays) enters as an ARGUMENT, never a
    # closure: closed-over device arrays become HLO constants and blow the
    # remote compile payload (CLAUDE.md — the HTTP 413 lesson)
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(operand, x):
        def step(y, _):
            z = apply_fn(operand, y)
            return z / (jnp.abs(z).max() + 1e-6), ()

        y, _ = jax.lax.scan(step, x, None, length=CHAIN)
        return y

    return run


def bench(apply_fn, operand, x, repeats=5):
    run = _chain_run(apply_fn)
    float(np.asarray(run(operand, x)).sum())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(operand, x)).sum())
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main() -> None:
    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2Adj

    results = []
    for gname in (os.environ.get("GN_GEOM_GRAPHS", "wiki-vote,enron")
                  .split(",")):
        g = load_graph(os.path.join(GRAPHS, gname))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, g.n_nodes, HIDDEN)),
            jnp.float32)

        # dense-MXU context row (the small-graph backend)
        if g.n_nodes <= 8192:
            a = np.zeros((g.n_nodes, g.n_nodes), np.float32)
            a[np.asarray(g.dst), np.asarray(g.src)] = 1.0
            per = bench(lambda a_, y: a_ @ y, jnp.asarray(a), x)
            row = {"graph": gname, "backend": "dense", "per_apply_ms":
                   round(per * 1e3, 4)}
            results.append(row)
            print(json.dumps(row), flush=True)

        for (k, r) in ((1024, 256), (2048, 256), (2048, 512), (4096, 512),
                       (4096, 1024), (8192, 1024)):
            for prec in ("f32", "bf16"):
                try:
                    adj = Pallas2Adj.from_graph(g, k_edges=k, r_rows=r,
                                                precision=prec)
                    per = bench(lambda a_, y: a_.matvec(y), adj, x)
                    row = {"graph": gname, "backend": "pallas2",
                           "k_edges": k, "r_rows": r, "precision": prec,
                           "per_apply_ms": round(per * 1e3, 4)}
                except Exception as e:  # noqa: BLE001 — record, keep sweeping
                    row = {"graph": gname, "backend": "pallas2",
                           "k_edges": k, "r_rows": r, "precision": prec,
                           "error": repr(e)[:200]}
                results.append(row)
                print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "runs_r5", "probe_spmm_geometry.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
