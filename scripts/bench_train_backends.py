"""GN-ODE train-epoch backend shoot-out on the real TPU.

Measures the full compiled training epoch (120 steps, batch 1, hidden 64,
40 euler steps, fwd+bwd+Adam — bench.py's north-star config) on wiki-vote
across SpMM backends, including the bf16 dense-MXU mode (a {0,1} adjacency
is exact in bf16 and the v5e MXU runs bf16 at ~4x its f32 rate). Timing is
best-of-N with a full host readback (block_until_ready lies through the
axon tunnel).

Usage: python scripts/bench_train_backends.py [--graph wiki-vote]
       [--backends dense dense-bf16 pallas2 ell]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def measure_epoch(graph, kind: str, repeats: int = 3) -> float:
    import jax
    import optax

    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
    from gn_ode_sir_tpu.train import TrialData
    from gn_ode_sir_tpu.train.loop import _data_to_device, make_train_epoch_fn

    n = graph.n_nodes
    rng = np.random.default_rng(0)
    n_distinct = 8
    i0 = np.zeros((n_distinct, n), np.float32)
    for k in range(n_distinct):
        i0[k, rng.choice(n, 2, replace=False)] = 1.0
    labels = rng.random((n_distinct, 20, n, 3)).astype(np.float32)
    labels /= labels.sum(-1, keepdims=True)
    data = TrialData(
        s0=1.0 - i0, i0=i0, r0=np.zeros_like(i0),
        beta=rng.uniform(0.1, 0.5, n_distinct).astype(np.float32),
        gamma=rng.uniform(0.1, 0.5, n_distinct).astype(np.float32),
        labels=labels, graph_idx=np.zeros(n_distinct, np.int32),
    )
    model = GNODE(hidden=64, max_time=20, delta_t=0.5,
                  compute_dtype="bf16" if kind.endswith("bf16") else "f32")
    optimizer = optax.adam(1e-4)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    adj = adjacency_from_graph(graph, kind=kind)
    d = _data_to_device(data)
    d["__adj_aux__"] = {"adj": adj}
    train_epoch = make_train_epoch_fn(model, optimizer, lambda gi, aux: aux["adj"])

    bi = (np.arange(120, dtype=np.int32) % n_distinct)[:, None]
    bw = np.ones((120, 1), np.float32)
    key = jax.random.PRNGKey(1)

    def run():
        p, o, loss = train_epoch(params, opt_state, d, bi, bw, key)
        return float(np.asarray(loss)) + float(
            np.asarray(jax.tree_util.tree_leaves(p)[0]).sum()
        )

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"  {kind}: epoch {best:.4f}s (compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    from gn_ode_sir_tpu.graphs import load_graph

    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="wiki-vote")
    ap.add_argument("--backends", nargs="+",
                    default=["dense", "dense-bf16", "pallas2", "ell"])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    g = load_graph(f"{GRAPHS}/{args.graph}")
    print(f"[{args.graph}] n={g.n_nodes} E={g.n_edges}", flush=True)
    out = {}
    for kind in args.backends:
        try:
            out[kind] = measure_epoch(g, kind, args.repeats)
        except Exception as e:  # keep the shoot-out alive across backends
            print(f"  {kind}: FAILED {type(e).__name__}: {e}", flush=True)
            out[kind] = None
    print(json.dumps({"graph": args.graph, "epoch_s": out}))


if __name__ == "__main__":
    main()
