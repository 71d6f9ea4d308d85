"""Label cache — content-addressed per-trial SIR label pickles.

Keeps the reference's on-disk contract (C15) so existing experiment
directories (e.g. ``multi-graph-1/Experiments-seed2-karate``) load directly:
files named ``<graph>-{S,I,R}-<i1>-<i2>.pkl`` holding [max_time, n] float64
probability arrays (``ode_nn_ngraph_sim.py:190-206``).

Normalization quirk reproduced: some reference datasets (wiki-vote, enron)
were cached as raw indicator COUNTS and divided by ``sim`` at load time
(``ode_nn_ngraphs.py:168-171``). We auto-detect: values above 1.5 cannot be
probabilities, so they are divided by ``sim``.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def label_paths(save_dir: str, graph_name: str, seed_nodes) -> dict:
    tag = "-".join(str(int(i)) for i in seed_nodes)
    return {
        c: os.path.join(save_dir, f"{graph_name}-{c}-{tag}.pkl") for c in ("S", "I", "R")
    }


def load_labels(save_dir: str, graph_name: str, seed_nodes, sim: int | None = None):
    """Load a cached (S, I, R) label triple; returns None on cache miss."""
    paths = label_paths(save_dir, graph_name, seed_nodes)
    if not all(os.path.exists(p) for p in paths.values()):
        return None
    out = []
    for c in ("S", "I", "R"):
        with open(paths[c], "rb") as f:
            arr = np.asarray(pickle.load(f), dtype=np.float64)
        if arr.max() > 1.5:  # stored as counts (wiki-vote/enron convention)
            if not sim:
                raise ValueError(f"{paths[c]} stored as counts but sim not given")
            arr = arr / float(sim)
        out.append(arr)
    return tuple(out)


def load_or_extract_labels(
    graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    sim: int = 10000,
    max_time: int = 20,
    save_dir: str | None = None,
    key=None,
    sims_chunk: int | None = None,
    coins: str = "bits16",
):
    """Cache-or-simulate, mirroring ``load_SIR_labels`` in every driver."""
    if save_dir is not None:
        cached = load_labels(save_dir, graph.name, seed_nodes, sim)
        if cached is not None:
            return cached

    from gn_ode_sir_tpu.sim import simulate_sir

    s, i, r = simulate_sir(
        graph,
        seed_nodes,
        beta,
        gamma,
        sims=sim,
        max_time=max_time,
        key=key,
        sims_chunk=sims_chunk,
        coins=coins,
    )
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        paths = label_paths(save_dir, graph.name, seed_nodes)
        for c, arr in zip(("S", "I", "R"), (s, i, r)):
            with open(paths[c], "wb") as f:
                pickle.dump(arr, f)
    return s, i, r
