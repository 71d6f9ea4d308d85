"""Probe: infected-neighbor COUNTS via dense int8 MXU matmul vs bucketed-ELL
gather+sum, at simulator shapes ([sims, n] indicator states).

Motivation: the MC simulator's per-step matmul does sims*n^2 MAC work while
the graph has only E edges (enron: n^2/E ~ 3,100x structural overwork). The
ELL formulation gathers rows of the TRANSPOSED state [n, sims] (sims on the
lane axis, so each gathered row is a long contiguous vector) and sums over
the padded neighbor width — total work O(E*sims) instead of O(n^2*sims).

Timing protocol (CLAUDE.md): one compiled program runs 20 applies over 4
pre-generated random states (real data dependency per step, so XLA cannot
CSE the loop), wall time includes a full host readback, best of N.

Usage:
  python scripts/probe_sparse_counts.py --graph wiki-vote [--sims 10000]
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/probe_sparse_counts.py \
      --graph karate --check   # correctness only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gn_ode_sir_tpu.graphs import load_graph
from gn_ode_sir_tpu.ops.ell import build_ell_buckets


def _bench(fn, args, repeats):
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).sum())  # full host readback
    compile_plus_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).sum())  # full host readback
        best = min(best, time.perf_counter() - t0)
    return best, compile_plus_first


# The scalar checksum only forces the readback and the step-to-step data
# dependency; exactness lives in --check. Per-step totals fit int32
# (~2e8 << 2^31 at enron scale); the cross-step accumulator is f32 so it
# cannot wrap (the previous int64 intent silently truncated to int32 with
# x64 disabled and overflowed at wiki-vote scale).
def _step_checksum(counts):
    return counts.sum(dtype=jnp.int32).astype(jnp.float32)


@partial(jax.jit, static_argnames=("steps",))
def dense_loop(states, a_i8, steps: int):
    # states: [4, sims, n] int8; a_i8: [n, n] int8
    def step(acc, t):
        i = states[t % 4]
        counts = jnp.dot(i, a_i8, preferred_element_type=jnp.int32)
        return acc + _step_checksum(counts), None

    acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(steps))
    return acc


# bucket_idx/inv_perm are jit ARGUMENTS, not closures — closure-captured
# device arrays become HLO constants and bloat the remote compile
# (CLAUDE.md; fit() threads adj_aux the same way).
@partial(jax.jit, static_argnames=("steps", "acc_dtype"))
def ell_loop(states_t, bucket_idx, inv_perm, steps: int, acc_dtype):
    # states_t: [4, n+1, sims] int8 (zero pad row already appended)
    def step(acc, t):
        xt = states_t[t % 4]
        outs = [xt[idx].sum(axis=1, dtype=acc_dtype) for idx in bucket_idx]
        counts = jnp.concatenate(outs, axis=0)  # sorted-node order
        # node order does not matter for the probe's checksum; the real
        # integration applies inv_perm (one more [n, sims] gather)
        counts = counts[inv_perm]
        return acc + _step_checksum(counts), None

    acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(steps))
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="wiki-vote")
    ap.add_argument("--sims", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--p", type=float, default=0.1, help="infected density")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--acc", default="int32", choices=["int32", "int16"])
    args = ap.parse_args()

    # bare names resolve like the other probe scripts: an explicit path is
    # used as-is, otherwise <data_root>/real_graphs/<name>
    graph_path = args.graph
    if not os.path.exists(graph_path) and not os.path.exists(graph_path + ".pkl"):
        root = os.environ.get("GN_ODE_SIR_DATA_ROOT", "/root/reference")
        graph_path = os.path.join(root, "real_graphs", args.graph)
    g = load_graph(graph_path)
    n = g.n_nodes
    rng = np.random.default_rng(0)
    states = (rng.random((4, args.sims, n)) < args.p).astype(np.int8)

    out = {"graph": args.graph, "n": n, "E_directed": int(g.src.shape[0]),
           "sims": args.sims, "steps": args.steps}

    bucket_idx, inv_perm = build_ell_buckets(g)
    out["ell_padded_E"] = int(sum(b.shape[0] * b.shape[1] for b in bucket_idx))

    if args.check:
        a = np.zeros((n, n), np.int8)
        np.add.at(a, (g.src, g.dst), 1)
        i0 = states[0]
        dense_counts = i0.astype(np.int32) @ a.astype(np.int32)
        xt = np.concatenate([i0.T, np.zeros((1, args.sims), np.int8)], axis=0)
        ell = np.concatenate(
            [xt[idx].sum(axis=1, dtype=np.int32) for idx in bucket_idx], axis=0
        )[inv_perm]
        assert np.array_equal(dense_counts.T, ell), "ELL counts != dense"
        print("check OK: ELL counts == dense counts")
        return

    if not args.skip_dense:
        a_i8 = jnp.asarray(g.dense_adjacency, jnp.int8)
        st = jnp.asarray(states)
        best, _ = _bench(lambda s: dense_loop(s, a_i8, args.steps), (st,),
                         args.repeats)
        out["dense_s_per_step"] = best / args.steps
        del st, a_i8

    states_t = np.concatenate(
        [states.transpose(0, 2, 1),
         np.zeros((4, 1, args.sims), np.int8)], axis=1)
    st_t = jnp.asarray(states_t)
    bidx = tuple(jnp.asarray(b) for b in bucket_idx)
    iperm = jnp.asarray(inv_perm)
    acc_dtype = jnp.int32 if args.acc == "int32" else jnp.int16
    best, compile_s = _bench(
        lambda s: ell_loop(s, bidx, iperm, args.steps, acc_dtype),
        (st_t,), args.repeats)
    out["ell_compile_plus_first_s"] = compile_s
    out[f"ell_{args.acc}_s_per_step"] = best / args.steps
    print(json.dumps(out))


if __name__ == "__main__":
    main()
