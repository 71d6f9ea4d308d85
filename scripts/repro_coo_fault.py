"""Root-cause repro for the round-1 intermittent TPU fault (VERDICT item 3).

Round-1 symptom: per-sample COO multigraph train programs at 7k-node padding
intermittently faulted the TPU worker; the auto backend routed around it.

Hypothesis: padding edges were appended as dst=0 AFTER the dst-sorted real
edges, while the per-sample ``CooAdj`` path calls
``jax.ops.segment_sum(..., indices_are_sorted=True)`` — passing unsorted
indices under that hint is undefined behavior in XLA's scatter lowering.

MEASURED OUTCOME (TPU v5e, 2026-08-16): NOT reproduced. Both layouts match
the dense oracle exactly here and in the full-train-program repro
(``repro_coo_train.py``), so the round-1 fault cannot be pinned on the
padding layout on the current stack; the dst-sorted padding fix is kept as
UB hygiene (the hint's contract is now actually honored).

The script compares, at 7072-node padding with wiki-vote-sized rows:
  A. segment-sum with UNSORTED padding (the round-1 layout) under the
     sorted hint — vs the dense-matmul oracle, repeated;
  B. the fixed layout (padding dst = n_max-1, still sorted) — vs the same
     oracle.

Usage: python scripts/repro_coo_fault.py
"""

from __future__ import annotations

import numpy as np

GRAPHS = "/root/reference/real_graphs"


def main():
    import jax
    import jax.numpy as jnp

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.ops.segment import segment_sum

    print("device:", jax.devices()[0])
    g = load_graph(f"{GRAPHS}/wiki-vote")
    n_max = 7072  # the round-1 padding that faulted
    e_max = ((g.n_edges + 127) // 128) * 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_max, 64)), jnp.float32)

    # oracle via unpadded sorted edges, indices_are_sorted honest
    src_r = jnp.asarray(g.src)
    dst_r = jnp.asarray(g.dst)

    @jax.jit
    def oracle(xx):
        return segment_sum(xx[src_r], dst_r, n_max, indices_are_sorted=True)

    ref = np.asarray(oracle(x))

    def padded(pad_dst):
        src = np.zeros(e_max, np.int32)
        dst = np.full(e_max, pad_dst, np.int32)
        w = np.zeros(e_max, np.float32)
        src[: g.n_edges], dst[: g.n_edges], w[: g.n_edges] = g.src, g.dst, 1.0
        return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)

    for label, pad_dst in (("UNSORTED dst=0 padding (round-1 layout)", 0),
                           ("sorted dst=n_max-1 padding (fixed)", n_max - 1)):
        src, dst, w = padded(pad_dst)

        @jax.jit
        def run(xx, src=src, dst=dst, w=w):
            # scan many applications: the round-1 fault was intermittent,
            # appearing inside long train programs
            def step(y, _):
                z = segment_sum(y[src] * w[:, None], dst, n_max,
                                indices_are_sorted=True)
                return z / (jnp.abs(z).mean() + 1e-6), ()

            y, _ = jax.lax.scan(step, xx, None, length=20)
            return y, segment_sum(xx[src] * w[:, None], dst, n_max,
                                  indices_are_sorted=True)

        try:
            errs = []
            for rep in range(5):
                y, once = run(x)
                once = np.asarray(once)
                errs.append(float(np.abs(once - ref).max()))
                float(np.asarray(y).sum())
            print(f"{label}: max|err| over reps = {max(errs):.3e} "
                  f"({'WRONG' if max(errs) > 1e-3 else 'ok'})")
        except Exception as e:
            print(f"{label}: FAULTED -> {type(e).__name__}: {str(e)[:200]}")

        # the actual round-1 path: per-sample [B, E] edges, vmapped
        # segment-sum (CooAdj.matvec per-sample branch)
        B = 8
        srcB = jnp.broadcast_to(src, (B, src.shape[0]))
        dstB = jnp.broadcast_to(dst, (B, dst.shape[0]))
        wB = jnp.broadcast_to(w, (B, w.shape[0]))
        xb = jnp.asarray(rng.random((B, n_max, 64)), jnp.float32)

        @jax.jit
        def run_b(xx):
            def one(s_, d_, w_, x_):
                return segment_sum(x_[s_] * w_[:, None], d_, n_max,
                                   indices_are_sorted=True)

            def step(y, _):
                z = jax.vmap(one)(srcB, dstB, wB, y)
                return z / (jnp.abs(z).mean() + 1e-6), ()

            y, _ = jax.lax.scan(step, xx, None, length=20)
            return y, jax.vmap(one)(srcB, dstB, wB, xx)

        try:
            errs = []
            for rep in range(5):
                y, once = run_b(xb)
                once = np.asarray(once)
                errs.append(float(np.abs(once - np.asarray(
                    jax.vmap(oracle)(xb))).max()))
                float(np.asarray(y).sum())
            print(f"{label} [per-sample B=8]: max|err| = {max(errs):.3e} "
                  f"({'WRONG' if max(errs) > 1e-3 else 'ok'})")
        except Exception as e:
            print(f"{label} [per-sample B=8]: FAULTED -> "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
