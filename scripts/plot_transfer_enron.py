"""Qualitative figure: the ngraphs-protocol model on UNSEEN enron, from the
saved checkpoint (no retraining).

Restores the Orbax checkpoint written by the round-3 unseen-enron run
(``runs_r3/ngraphs_enron/ckpt-trial1-ode_nn-mg-...``; RESULTS.md "Round 3:
the protocol at ENRON scale") and plots, for one unseen enron test trial,
the across-node mean S/I/R trajectories: cached 10k-sim MC labels (with a
10-90% across-node band) vs the transferred GN-ODE prediction. Trial
parameters come from the run's pinned ``initial-{seed,beta,gamma}.pkl``
(reference layout, ``ode_nn_ngraphs.py:326-328``), so the plotted trial is
exactly one of the run's test trials (local indices 60-119 per
``multigraph_split``).

CPU-safe: a single forward pass (hidden 8, 40 euler steps, COO SpMM over
enron's 362k directed edges) takes seconds — run with
``env PYTHONPATH= JAX_PLATFORMS=cpu`` to leave the TPU untouched.

Usage:
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/plot_transfer_enron.py \\
      [--run_dir runs_r3/ngraphs_enron] [--trial_offset 0] \\
      [--out images/sir_transfer_enron.png]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# validated categorical palette, fixed slot order (dataviz reference)
C_LABEL = "#2a78d6"
C_MODEL = "#eb6834"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"

TRAIN_NAMES = ["dolphins", "fb-food", "fb-social", "openflights", "wiki-vote"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", default="runs_r3/ngraphs_enron")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (default: ckpt-trial1-ode_nn-mg-... "
                        "under --run_dir)")
    p.add_argument("--graph", default="/root/reference/real_graphs/enron")
    p.add_argument("--hidden", type=int, default=8)
    p.add_argument("--sim", type=int, default=10000)
    p.add_argument("--trial_offset", type=int, default=0,
                   help="offset into the 60 unseen test trials")
    p.add_argument("--out", default="images/sir_transfer_enron.png")
    args = p.parse_args()

    import jax.numpy as jnp

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
    from gn_ode_sir_tpu.train.checkpoint import restore_checkpoint
    from gn_ode_sir_tpu.utils.labels import load_or_extract_labels

    graph = load_graph(args.graph)
    label_dir = os.path.join(args.run_dir, f"Experiments-seed2-{graph.name}")
    with open(os.path.join(label_dir, "initial-seed.pkl"), "rb") as f:
        seeds = pickle.load(f)
    with open(os.path.join(label_dir, "initial-beta.pkl"), "rb") as f:
        betas = pickle.load(f)
    with open(os.path.join(label_dir, "initial-gamma.pkl"), "rb") as f:
        gammas = pickle.load(f)
    # eval-graph trials split first-half val / second-half test
    k = len(seeds) // 2 + args.trial_offset
    seed_nodes, beta, gamma = list(seeds[k]), float(betas[k]), float(gammas[k])
    s_lab, i_lab, r_lab = load_or_extract_labels(
        graph, seed_nodes, beta, gamma, sim=args.sim, save_dir=label_dir)
    label = np.stack([s_lab, i_lab, r_lab], -1)  # [T, n, 3]

    ckpt = args.ckpt or os.path.join(
        args.run_dir,
        "ckpt-trial1-ode_nn-mg-" + "-".join(TRAIN_NAMES + [graph.name]),
    )
    if not os.path.isdir(ckpt):
        # the round-3 trial-1 run predates dataset names in checkpoint paths
        legacy = os.path.join(args.run_dir, "ckpt-trial1-ode_nn-mg")
        if os.path.isdir(legacy):
            ckpt = legacy
    # the checkpoint was written on TPU; restoring on CPU needs a concrete
    # target pytree so orbax re-shards onto local devices
    import jax
    import optax

    model_t = GNODE(hidden=args.hidden)
    p0 = model_t.init(jax.random.PRNGKey(0))
    target = {
        "params": p0, "opt_state": optax.adam(1e-3).init(p0),
        "epoch": 0, "best_val": 0.0, "best_epoch": 0, "test_loss": 0.0,
    }
    state = restore_checkpoint(ckpt, target)
    params, epoch = state["params"], int(state["epoch"])
    print(f"restored {ckpt} at epoch {epoch} "
          f"(best val {float(state['best_val']):.4f} @ {int(state['best_epoch'])})")

    n = graph.n_nodes
    i0 = np.zeros((1, n), np.float32)
    i0[0, seed_nodes] = 1.0
    model = GNODE(hidden=args.hidden)
    adj = adjacency_from_graph(graph, kind="coo")
    pred = np.asarray(model.predict(
        params, adj,
        jnp.asarray(1.0 - i0), jnp.asarray(i0), jnp.asarray(np.zeros_like(i0)),
        jnp.asarray([beta], jnp.float32), jnp.asarray([gamma], jnp.float32),
    ))[:, 0]  # [T, n, 3]
    l1 = float(np.abs(pred[1:] - label[1:]).mean())
    print(f"trial L1 (t>=1): {l1:.4f}  beta={beta:.3f} gamma={gamma:.3f}")

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
        ax.plot(ts, label[:, :, c].mean(1), color=C_LABEL, lw=2,
                label="MC labels (10k sims)")
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
    fig.suptitle(
        f"transfer to unseen enron (33,696 nodes): trained on "
        f"{'+'.join(TRAIN_NAMES)} (beta={beta:.2f}, gamma={gamma:.2f}, "
        f"epoch {epoch}, trial L1 {l1:.3f})",
        color=TEXT, fontsize=11, y=1.02,
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=150, bbox_inches="tight", facecolor=SURFACE)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
