"""Train-level repro for the round-1 intermittent TPU fault (VERDICT item 3).

`repro_coo_fault.py` probes the raw segment-sum; the round-1 symptom,
however, appeared inside FULL multigraph train programs (per-sample CooAdj
at 7,072-node padding: 40-step euler scan x fwd+bwd x Adam). This script
runs that exact program shape — the 5-graph config (dolphins+fb-food+
fb-social+openflights+wiki-vote), GNODE hidden=8, batch 8, mg_adj='coo' —
on synthetic labels (no extraction needed), under BOTH edge-padding
layouts:

  new: padding dst = n_max-1 (list stays dst-sorted; current layout)
  old: padding dst = 0 appended after the sorted real edges (round-1
       layout — violates the ``indices_are_sorted=True`` hint downstream)

Usage: python scripts/repro_coo_train.py [--layout new|old|both]
                                         [--epochs 20] [--repeats 2]

MEASURED OUTCOME (TPU v5e, 2026-08-16): no fault under EITHER layout — all
four runs completed with bit-identical losses across layouts (the weight-0
padding edges contribute nothing either way on this stack). The round-1
intermittent fault is gone from the current stack; root cause remains
unproven, with the sorted-hint UB eliminated as a latent suspect.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

GRAPHS = "/root/reference/real_graphs"
NAMES = ["dolphins", "fb-food", "fb-social", "openflights", "wiki-vote"]


def main():
    import jax
    import optax

    from gn_ode_sir_tpu.graphs import load_graph, pad_graphs
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.train import fit, multigraph_adj_fns, multigraph_split
    from gn_ode_sir_tpu.train.data import build_trial_data

    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="both", choices=["new", "old", "both"])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--per_graph", type=int, default=8)
    args = ap.parse_args()

    print("device:", jax.devices()[0])
    graphs = [load_graph(f"{GRAPHS}/{n}") for n in NAMES]
    batch = pad_graphs(graphs)
    print(f"padded to n={batch.n_max}, e={batch.e_max}")

    rng = np.random.default_rng(0)
    seed_sets, betas, gammas, triples, gidx = [], [], [], [], []
    T = 20
    for g_i, g in enumerate(graphs):
        for _ in range(args.per_graph):
            seed_sets.append([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)])
            betas.append(float(rng.uniform(0.1, 0.5)))
            gammas.append(float(rng.uniform(0.1, 0.5)))
            lab = rng.random((3, T, g.n_nodes)).astype(np.float32)
            lab /= lab.sum(0)  # S+I+R=1, label-shaped
            triples.append((lab[0], lab[1], lab[2]))
            gidx.append(g_i)
    data = build_trial_data(batch.n_max, seed_sets, betas, gammas, triples,
                            graph_idx=gidx, n_pad=batch.n_max)
    tr, va, te = multigraph_split([args.per_graph] * len(graphs))

    def run(layout: str, rep: int):
        b = batch
        if layout == "old":
            # reconstruct the round-1 padding: dst=0/src=0/w=0 AFTER the
            # dst-sorted real edges -> violates the sorted hint downstream
            src, dst, w = b.src.copy(), b.dst.copy(), b.edge_w.copy()
            for g in range(src.shape[0]):
                e = int(b.n_edges[g])
                src[g, e:] = 0
                dst[g, e:] = 0
                w[g, e:] = 0.0
            import dataclasses as dc

            b = dc.replace(b, src=src, dst=dst, edge_w=w)
        adj_fn, node_mask_fn, adj_aux = multigraph_adj_fns(b, kind="coo")
        model = GNODE(hidden=8, max_time=T, delta_t=0.5)
        params = model.init(jax.random.PRNGKey(rep))
        t0 = time.perf_counter()
        res = fit(model, optax.adam(1e-3), params, data, tr, va, te, adj_fn,
                  adj_aux=adj_aux, epochs=args.epochs, batch_size=8,
                  seed=rep, node_mask_fn=node_mask_fn, verbose=False)
        dt = time.perf_counter() - t0
        ok = np.isfinite(res.best_val_loss)
        print(f"  layout={layout} rep={rep}: {'ok' if ok else 'NON-FINITE'} "
              f"best_val={res.best_val_loss:.4f} test={res.test_loss:.4f} "
              f"wall={dt:.1f}s", flush=True)

    layouts = ["new", "old"] if args.layout == "both" else [args.layout]
    for layout in layouts:
        print(f"layout={layout}:", flush=True)
        for rep in range(args.repeats):
            try:
                run(layout, rep)
            except Exception as e:
                print(f"  layout={layout} rep={rep}: FAULTED -> "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
