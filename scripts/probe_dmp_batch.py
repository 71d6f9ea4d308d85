"""A/B: DMP per-trial loop vs run_many (one vmapped program, one dispatch).

The reference loops the test split one DMP inference at a time
(``dmp.py:347-350``); ``DMPSIR.run_many`` batches it. Timing protocol per
CLAUDE.md: full host readback, best-of-N, compile excluded (one warmup).

Usage: python scripts/probe_dmp_batch.py [--graph wiki-vote] [--trials 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="wiki-vote")
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--max_time", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from gn_ode_sir_tpu.graphs import load_graph
    from gn_ode_sir_tpu.models import DMPSIR

    g = load_graph(f"/root/reference/real_graphs/{args.graph}")
    dmp = DMPSIR.from_graph(g)
    rng = np.random.default_rng(0)
    B = args.trials
    seed_sets = [rng.choice(g.n_nodes, 2, replace=False) for _ in range(B)]
    betas = rng.uniform(0.1, 0.5, B).astype(np.float32)
    gammas = rng.uniform(0.1, 0.5, B).astype(np.float32)

    def loop_all():
        return np.stack([
            np.asarray(dmp.run(seed_sets[k], float(betas[k]),
                               float(gammas[k]), max_time=args.max_time))
            for k in range(B)
        ])

    def batch_all():
        return np.asarray(dmp.run_many(seed_sets, betas, gammas,
                                       max_time=args.max_time))

    ref = loop_all()  # warmup + reference values
    got = batch_all()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    res = {"graph": args.graph, "trials": B,
           "platform": jax.devices()[0].platform,
           "max_time": args.max_time}
    for name, fn in (("per_trial_loop_s", loop_all), ("run_many_s", batch_all)):
        best = min(
            (lambda t0=time.perf_counter(): (float(fn().sum()),
                                             time.perf_counter() - t0))()[1]
            for _ in range(args.repeats)
        )
        res[name] = best
    res["speedup"] = res["per_trial_loop_s"] / res["run_many_s"]
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
