"""Qualitative figure: multi-graph transfer to an UNSEEN graph.

Trains GN-ODE on dolphins+fb-food+fb-social+openflights and plots, for one
unseen wiki-vote test trial, the across-node mean S/I/R trajectories (MC
labels with a 10-90% across-node band vs the transferred GN-ODE).

Usage (TPU recommended; label cache reused from prior runs):
  python scripts/plot_transfer.py --labels_root /tmp/mg5-parity \\
      [--epochs 150] [--out images/sir_transfer_wikivote.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# validated categorical palette, fixed slot order (dataviz reference)
C_LABEL = "#2a78d6"
C_MODEL = "#eb6834"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets",
                   default="/root/reference/real_graphs/dolphins+fb-food+fb-social+openflights+wiki-vote")
    p.add_argument("--labels_root", default="/tmp/mg5-parity")
    p.add_argument("--instances", type=int, nargs="+", default=[36, 36, 36, 36, 120])
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--hidden", type=int, default=8)
    p.add_argument("--sim", type=int, default=10000)
    p.add_argument("--trial_offset", type=int, default=0, help="offset into the unseen test trials")
    p.add_argument("--out", default="images/sir_transfer_wikivote.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gn_ode_sir_tpu.graphs import load_graphs
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.train import (
        assemble_multigraph_trials,
        fit,
        multigraph_adj_fns,
        multigraph_split,
    )

    graphs = load_graphs(args.datasets)
    names = [g.name for g in graphs]
    rng = np.random.default_rng(0)
    per_graph = []
    for g_i, g in enumerate(graphs):
        per_graph.append([
            ([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
             float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
            for _ in range(args.instances[g_i])
        ])
    label_dirs = [os.path.join(args.labels_root, f"Experiments-seed2-{n}") for n in names]
    for d in label_dirs:
        os.makedirs(d, exist_ok=True)
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, label_dirs=label_dirs, sim=args.sim, max_time=20,
        rng_key=jax.random.PRNGKey(0),
    )
    tr, va, te = multigraph_split(args.instances)
    adj_fn, node_mask_fn, adj_aux = multigraph_adj_fns(batch)
    model = GNODE(hidden=args.hidden)
    params = model.init(jax.random.PRNGKey(0))
    res = fit(model, optax.adam(1e-3), params, data, tr, va, te, adj_fn,
              adj_aux=adj_aux, epochs=args.epochs, batch_size=8,
              node_mask_fn=node_mask_fn, verbose=True, log_every=50)
    print("unseen test L1:", res.test_loss)

    k = te[args.trial_offset]
    aux_d = jax.tree_util.tree_map(jnp.asarray, adj_aux)
    adj = adj_fn(jnp.asarray([data.graph_idx[k]]), aux_d)
    pred = np.asarray(model.predict(
        res.params, adj,
        jnp.asarray(data.s0[k:k + 1]), jnp.asarray(data.i0[k:k + 1]),
        jnp.asarray(data.r0[k:k + 1]),
        jnp.asarray(data.beta[k:k + 1]), jnp.asarray(data.gamma[k:k + 1]),
    ))[:, 0]
    n_eval = graphs[data.graph_idx[k]].n_nodes
    pred = pred[:, :n_eval]
    label = data.labels[k][:, :n_eval]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = label.shape[0]
    ts = np.arange(T)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6), facecolor=SURFACE, sharey=True)
    for c, (ax, name) in enumerate(zip(axes, ["Susceptible", "Infected", "Recovered"])):
        ax.set_facecolor(SURFACE)
        lo = np.percentile(label[:, :, c], 10, axis=1)
        hi = np.percentile(label[:, :, c], 90, axis=1)
        ax.fill_between(ts, lo, hi, color=C_LABEL, alpha=0.14, linewidth=0)
        ax.plot(ts, label[:, :, c].mean(1), color=C_LABEL, lw=2, label="MC labels (10k sims)")
        ax.plot(ts, pred[:, :, c].mean(1), color=C_MODEL, lw=2, ls="--",
                label="GN-ODE (never trained on this graph)")
        ax.set_title(name, color=TEXT, fontsize=11)
        ax.set_xlabel("t", color=TEXT2)
        ax.tick_params(colors=TEXT2)
        for s_ in ("top", "right"):
            ax.spines[s_].set_visible(False)
        for s_ in ("left", "bottom"):
            ax.spines[s_].set_color("#d8d7d2")
        ax.grid(axis="y", color="#edece8", lw=0.8)
        ax.set_axisbelow(True)
    axes[0].set_ylabel("mean per-node probability", color=TEXT2)
    axes[0].legend(frameon=False, fontsize=9, labelcolor=TEXT)
    eval_name = names[data.graph_idx[k]]
    fig.suptitle(
        f"transfer to unseen {eval_name}: trained on {'+'.join(names[:-1])} "
        f"(beta={float(data.beta[k]):.2f}, gamma={float(data.gamma[k]):.2f})",
        color=TEXT, fontsize=11, y=1.02,
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=150, bbox_inches="tight", facecolor=SURFACE)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
