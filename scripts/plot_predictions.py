"""Qualitative figure: per-node SIR trajectories — MC labels vs GN-ODE vs RK.

Parity artifact for the reference's ``images/sir_predictions_karate.png``
(README:4-6). Trains GN-ODE briefly on the shipped karate fixtures, then
plots, for one held-out test trial, the across-node mean trajectory of each
compartment with a 10-90% across-node band for the MC ground truth.

Usage:
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/plot_predictions.py \
      [--epochs 120] [--out images/sir_predictions_karate.png]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# validated categorical palette, slots in fixed order (dataviz reference)
C_LABEL = "#2a78d6"  # slot 1: MC labels (ground truth)
C_MODEL = "#eb6834"  # slot 2: GN-ODE prediction
C_RK = "#1baf7a"     # slot 3: RK mean-field baseline
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fixture", default="/root/reference/multi-graph-1/Experiments-seed2-karate")
    p.add_argument("--graph", default="/root/reference/real_graphs/karate")
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--trial", type=int, default=-1, help="test-trial offset to plot")
    p.add_argument("--out", default="images/sir_predictions_karate.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
    from gn_ode_sir_tpu.sim import sir_classical
    from gn_ode_sir_tpu.train import build_trial_data, fit, split_indices
    from gn_ode_sir_tpu.utils import load_labels

    g = load_graph(args.graph)
    with open(os.path.join(args.fixture, "initial-seed.pkl"), "rb") as f:
        seeds_all = pickle.load(f)
    with open(os.path.join(args.fixture, "initial-beta.pkl"), "rb") as f:
        betas = pickle.load(f)
    with open(os.path.join(args.fixture, "initial-gamma.pkl"), "rb") as f:
        gammas = pickle.load(f)
    triples = [load_labels(args.fixture, "karate", s, sim=10000) for s in seeds_all]
    keep = [i for i, t in enumerate(triples) if t is not None]
    data = build_trial_data(
        g.n_nodes,
        [seeds_all[i] for i in keep],
        [betas[i] for i in keep],
        [gammas[i] for i in keep],
        [triples[i] for i in keep],
    )
    tr, va, te = split_indices(data.num_trials)

    model = GNODE(hidden=args.hidden)
    params = model.init(jax.random.PRNGKey(0))
    adj = adjacency_from_graph(g)
    res = fit(model, optax.adam(1e-3), params, data, tr, va, te, lambda gi: adj,
              epochs=args.epochs, batch_size=8, verbose=True, log_every=40)

    k = te[args.trial]
    pred = np.asarray(model.predict(
        res.params, adj,
        jnp.asarray(data.s0[k:k + 1]), jnp.asarray(data.i0[k:k + 1]),
        jnp.asarray(data.r0[k:k + 1]),
        jnp.asarray(data.beta[k:k + 1]), jnp.asarray(data.gamma[k:k + 1]),
    ))[:, 0]  # [T, n, 3]
    label = data.labels[k]  # [T, n, 3]
    seeds_k = np.nonzero(data.i0[k])[0]
    i_rk, s_rk, r_rk = sir_classical(g, seeds_k, float(data.beta[k]), float(data.gamma[k]))
    rk = np.stack([s_rk, i_rk, r_rk], -1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = label.shape[0]
    ts = np.arange(T)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6), facecolor=SURFACE, sharey=True)
    names = ["Susceptible", "Infected", "Recovered"]
    for c, ax in enumerate(axes):
        ax.set_facecolor(SURFACE)
        lo = np.percentile(label[:, :, c], 10, axis=1)
        hi = np.percentile(label[:, :, c], 90, axis=1)
        ax.fill_between(ts, lo, hi, color=C_LABEL, alpha=0.14, linewidth=0)
        ax.plot(ts, label[:, :, c].mean(1), color=C_LABEL, lw=2, label="MC labels (10k sims)")
        ax.plot(ts, pred[:, :, c].mean(1), color=C_MODEL, lw=2, ls="--", label="GN-ODE")
        ax.plot(ts, rk[:, :, c].mean(1), color=C_RK, lw=2, ls=":", label="RK mean-field")
        ax.set_title(names[c], color=TEXT, fontsize=11)
        ax.set_xlabel("t", color=TEXT2)
        ax.tick_params(colors=TEXT2)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#d8d7d2")
        ax.grid(axis="y", color="#edece8", lw=0.8)
        ax.set_axisbelow(True)
    axes[0].set_ylabel("mean per-node probability", color=TEXT2)
    axes[0].legend(frameon=False, fontsize=9, labelcolor=TEXT)
    fig.suptitle(
        f"karate test trial: seeds={[int(s) for s in seeds_k]}, "
        f"beta={float(data.beta[k]):.2f}, gamma={float(data.gamma[k]):.2f} "
        f"(band = 10-90% across nodes, MC)",
        color=TEXT, fontsize=11, y=1.02,
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=150, bbox_inches="tight", facecolor=SURFACE)
    print("wrote", args.out, " test L1:", res.test_loss)


if __name__ == "__main__":
    main()
