"""Quickstart: the full library workflow on one small graph, end to end.

Mirrors the reference's canonical experiment (``monitorer-sim.py`` defaults,
scaled down so it finishes in ~30 s on CPU): extract Monte-Carlo SIR labels,
train the GN-ODE on a trial split, evaluate on held-out trials, and predict.

Run:  python examples/quickstart.py [--dataset /root/reference/real_graphs/karate]
Scale the knobs back up (sims=10000, trials=200, epochs=500, hidden=64) for
the reference's full canonical protocol.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gn_ode_sir_tpu.graphs import load_graph
from gn_ode_sir_tpu.models import GNODE
from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph
from gn_ode_sir_tpu.sim import simulate_sir
from gn_ode_sir_tpu.train import build_trial_data, fit, split_indices


def main(dataset: str = "/root/reference/real_graphs/karate",
         trials: int = 12, sims: int = 2000, epochs: int = 40,
         hidden: int = 16, max_time: int = 20, seed: int = 0,
         verbose: bool = True) -> float:
    graph = load_graph(dataset)
    if verbose:
        print(f"graph: {graph.name} ({graph.n_nodes} nodes, "
              f"{graph.src.shape[0]} directed edges)")

    # 1. Sample trial parameters and extract MC labels on device
    #    (the monitorer persists these via initial-{seed,beta,gamma}.pkl).
    rng = np.random.default_rng(seed)
    seed_sets, betas, gammas, triples = [], [], [], []
    for k in range(trials):
        seeds = rng.choice(graph.n_nodes, 2, replace=False)
        beta, gamma = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
        S, I, R = simulate_sir(graph, seeds, beta, gamma, sims=sims,
                               max_time=max_time,
                               key=jax.random.PRNGKey(k))
        seed_sets.append(list(seeds))
        betas.append(beta)
        gammas.append(gamma)
        triples.append((S, I, R))

    # 2. Assemble the trial dataset and the reference's 60/20/20 order split.
    data = build_trial_data(graph.n_nodes, seed_sets, betas, gammas, triples)
    train_idx, val_idx, test_idx = split_indices(trials)

    # 3. Train GN-ODE (whole-epoch compiled scan, best-val-test protocol).
    model = GNODE(hidden=hidden, max_time=max_time)
    params = model.init(jax.random.PRNGKey(seed))
    adj = adjacency_from_graph(graph)  # dense-MXU / Pallas / ELL by scale
    result = fit(model, optax.adam(1e-3), params, data,
                 train_idx, val_idx, test_idx, lambda gi: adj,
                 epochs=epochs, batch_size=4, verbose=verbose, log_every=10)
    if verbose:
        print(f"best val L1 {result.best_val_loss:.4f} at epoch "
              f"{result.best_epoch}; held-out test L1 {result.test_loss:.4f}")

    # 3b. Repeats as a tensor axis: K differently-initialized members train
    #     in ONE compiled program (the protocol's hidden_dim_array repeats;
    #     pass mesh=Mesh(...) to shard the member axis over devices).
    from gn_ode_sir_tpu.train import fit_ensemble, init_ensemble

    ens_seeds = [seed, seed + 1]
    ens = fit_ensemble(model, optax.adam(1e-3),
                       init_ensemble(model, ens_seeds), data,
                       train_idx, val_idx, test_idx, lambda gi: adj,
                       seeds=ens_seeds, epochs=max(epochs // 4, 1),
                       batch_size=4, verbose=False)
    if verbose:
        tl = "/".join(f"{float(x):.4f}" for x in ens.test_loss)
        print(f"2-member ensemble (one vmapped program): test L1 {tl}")

    # 4. Predict per-node S/I/R trajectories with the trained parameters.
    k = int(test_idx[0])
    probs = model.predict(result.params, adj,
                          data.s0[k:k + 1], data.i0[k:k + 1],
                          data.r0[k:k + 1], data.beta[k:k + 1],
                          data.gamma[k:k + 1])  # [T, 1, n, 3]
    mae = float(np.mean(np.abs(
        np.asarray(probs)[1:, 0] - data.labels[k, 1:])))
    if verbose:
        print(f"test trial {k}: predicted trajectories {probs.shape}, "
              f"L1 vs MC labels {mae:.4f}")
    return mae


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="/root/reference/real_graphs/karate")
    p.add_argument("--trials", type=int, default=12)
    p.add_argument("--sims", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--hidden", type=int, default=16)
    a = p.parse_args()
    main(a.dataset, trials=a.trials, sims=a.sims, epochs=a.epochs,
         hidden=a.hidden)
