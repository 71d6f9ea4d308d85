"""Label cache — content-addressed per-trial SIR label pickles.

Keeps the reference's on-disk contract (C15) so existing experiment
directories (e.g. ``multi-graph-1/Experiments-seed2-karate``) load directly:
files named ``<graph>-{S,I,R}-<i1>-<i2>.pkl`` holding [max_time, n] float64
probability arrays (``ode_nn_ngraph_sim.py:190-206``).

CACHE-KEY FIX (DEVIATIONS.md #15): the reference keys the cache by SEED SET
ONLY, so two trials sharing a seed set but with different (beta, gamma)
collide — the second trial silently trains/evaluates on the first trial's
labels (23 of the 200 shipped karate trials collide; e.g. trials 63/65 both
map to ``karate-*-13-18.pkl``, which holds the beta=0.449 labels while trial
65 has beta=0.186). New labels are therefore WRITTEN under a
(seeds, beta, gamma)-tagged name; reads try the exact-tagged name first and
fall back to the reference's seeds-only name so shipped experiment
directories keep loading (with the reference's own collision semantics).

Normalization quirk reproduced: some reference datasets (wiki-vote, enron)
were cached as raw indicator COUNTS and divided by ``sim`` at load time
(``ode_nn_ngraphs.py:168-171``). We auto-detect: values above 1.5 cannot be
probabilities, so they are divided by ``sim``.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def label_paths(save_dir: str, graph_name: str, seed_nodes,
                beta: float | None = None, gamma: float | None = None) -> dict:
    """Pickle paths for one trial. With ``beta``/``gamma`` given, the name
    carries the full trial key; without, the reference's seeds-only name."""
    tag = "-".join(str(int(i)) for i in seed_nodes)
    if beta is not None and gamma is not None:
        tag = f"{tag}-b{float(beta):.6g}-g{float(gamma):.6g}"
    return {
        c: os.path.join(save_dir, f"{graph_name}-{c}-{tag}.pkl") for c in ("S", "I", "R")
    }


def load_labels(save_dir: str, graph_name: str, seed_nodes, sim: int | None = None,
                beta: float | None = None, gamma: float | None = None):
    """Load a cached (S, I, R) label triple; returns None on cache miss.

    With ``beta``/``gamma`` given, the exact-keyed name is tried first, then
    the legacy seeds-only name (reference compatibility).
    """
    paths = None
    if beta is not None and gamma is not None:
        exact = label_paths(save_dir, graph_name, seed_nodes, beta, gamma)
        if all(os.path.exists(p) for p in exact.values()):
            paths = exact
    if paths is None:
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
    coins: str = "auto",
    matmul: str = "auto",
):
    """Cache-or-simulate, mirroring ``load_SIR_labels`` in every driver."""
    if save_dir is not None:
        cached = load_labels(save_dir, graph.name, seed_nodes, sim, beta, gamma)
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
        matmul=matmul,
    )
    if save_dir is not None:
        _record_coin_mode(save_dir, coins)
        _write_labels(save_dir, graph.name, seed_nodes, beta, gamma, (s, i, r))
    return s, i, r


def _record_coin_mode(save_dir: str, coins: str) -> None:
    """Persist the RESOLVED coin mode next to the label cache.

    ``coins='auto'`` resolves to ``rbg16`` on TPU, whose draws depend on the
    batch composition of cache misses and on the XLA build — so a cold-cache
    rerun of a pinned experiment can regenerate different (equally valid) MC
    labels. Recording the mode makes that visible: if a later extraction into
    the same cache uses a different mode, the mix is flagged loudly instead
    of silently blending streams.
    """
    import json

    from gn_ode_sir_tpu.sim.mc_sir import _resolve_coins

    resolved = _resolve_coins(coins)
    os.makedirs(save_dir, exist_ok=True)
    meta_path = os.path.join(save_dir, "coins-mode.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev.get("coins") != resolved:
            print(
                f"[labels] WARNING: cache {save_dir} was extracted with "
                f"coins={prev.get('coins')!r} but this run uses "
                f"coins={resolved!r}; cached and fresh labels mix MC streams "
                f"(both valid estimates, but the cache is no longer "
                f"single-mode reproducible)"
            )
        return
    with open(meta_path, "w") as f:
        json.dump({"coins": resolved, "note": (
            "resolved RNG mode used for cache-miss label extraction; "
            "rbg16 draws depend on miss-batch composition and XLA build "
            "(reruns regenerate different valid MC streams), bits16 is "
            "key-exact reproducible"
        )}, f, indent=2)


def _write_labels(save_dir, graph_name, seed_nodes, beta, gamma, triple):
    os.makedirs(save_dir, exist_ok=True)
    # write under the exact (seeds, beta, gamma) key: the seeds-only
    # reference name collides across trials sharing a seed set
    paths = label_paths(save_dir, graph_name, seed_nodes, beta, gamma)
    for c, arr in zip(("S", "I", "R"), triple):
        with open(paths[c], "wb") as f:
            pickle.dump(arr, f)


def load_or_extract_labels_many(
    graph,
    trials,
    *,
    sim: int = 10000,
    max_time: int = 20,
    save_dir: str | None = None,
    keys=None,
    sims_chunk: int | None = None,
    coins: str = "auto",
    matmul: str = "auto",
):
    """Batched cache-or-simulate over a trial list [(seeds, beta, gamma)].

    Cache hits load from disk; ALL misses are simulated together through
    :func:`gn_ode_sir_tpu.sim.simulate_sir_many` (one vmapped device program
    per ``trials_chunk`` trials — the per-trial dispatch/tunnel floor is paid
    once per chunk instead of once per trial). ``keys`` gives one PRNG key
    per trial (aligned with ``trials``). With threefry coins (``bits16``)
    each miss draws the exact stream the sequential path would under its
    key; with ``rbg16`` (the TPU ``auto`` default) XLA's RngBitGenerator
    batches from a single key, so a miss's draw is a valid but
    batch-composition-dependent stream (re-running with a different set of
    cache misses re-draws them) — both are equally correct MC estimates.
    """
    triples: list = [None] * len(trials)
    missing: list[int] = []
    for j, (seeds, beta, gamma) in enumerate(trials):
        cached = (
            load_labels(save_dir, graph.name, seeds, sim, beta, gamma)
            if save_dir is not None else None
        )
        if cached is not None:
            triples[j] = cached
        else:
            missing.append(j)
    if missing:
        if save_dir is not None:
            _record_coin_mode(save_dir, coins)
        if sims_chunk is not None:
            # huge-graph regime: per-trial sims chunking, no trial batching.
            # keys=None must still give every miss a DISTINCT stream — the
            # same fold_in(key0, 1000+pos) schedule simulate_sir_many
            # defaults to (mc_sir.py). Leaving key=None here would hand
            # every trial simulate_sir's PRNGKey(0) default: trials sharing
            # (seeds, beta, gamma-ish) would draw bit-identical coins and
            # all misses would be stream-correlated.
            import jax as _jax

            from gn_ode_sir_tpu.sim import simulate_sir

            if keys is None:
                _k0 = _jax.random.PRNGKey(0)
                miss_keys = [_jax.random.fold_in(_k0, 1000 + pos)
                             for pos in range(len(missing))]
            else:
                miss_keys = [keys[j] for j in missing]
            fresh = [
                simulate_sir(
                    graph, *trials[j][:3], sims=sim, max_time=max_time,
                    key=mk, sims_chunk=sims_chunk, coins=coins,
                    matmul=matmul,
                )
                for j, mk in zip(missing, miss_keys)
            ]
        else:
            from gn_ode_sir_tpu.sim import simulate_sir_many

            fresh = simulate_sir_many(
                graph, [trials[j] for j in missing], sims=sim,
                max_time=max_time,
                keys=None if keys is None else [keys[j] for j in missing],
                coins=coins, matmul=matmul,
            )
        for j, triple in zip(missing, fresh):
            triples[j] = triple
            if save_dir is not None:
                seeds, beta, gamma = trials[j]
                _write_labels(save_dir, graph.name, seeds, beta, gamma, triple)
    return triples
