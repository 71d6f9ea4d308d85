"""Canonical experiments at the exact reference defaults (VERDICT r1 item 2).

Drives the real monitorer entry (L5) at the `monitorer-sim.py:10-24`
defaults — 200 trials (n_I=2), 10k-sim labels, GN-ODE hidden=64, lr=1e-4,
batch_size=1, 500 epochs, 60/20/20 order split — and leaves the metrics
CSVs under the tracked `results/canonical/` tree:

- karate: consumes the reference's SHIPPED experiment fixtures
  (`multi-graph-1/Experiments-seed2-karate`: `initial-{seed,beta,gamma}.pkl`
  + the 177 label triples, README:21-22) copied into the run dir at runtime
  so no label extraction happens and the trial parameters are bit-identical
  to the reference's.
- wiki-vote: samples its own 200 trials (seed 0, persisted to
  `initial-*.pkl` in the run dir) and extracts 10k-sim labels on device.

Usage: python scripts/run_canonical.py [--dataset karate|wiki-vote|both]
       [--epochs 500]
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

REF_KARATE = "/root/reference/multi-graph-1/Experiments-seed2-karate"
ROOT = "./results/canonical"


def prepare_karate_fixtures(run_dir: str):
    os.makedirs(run_dir, exist_ok=True)
    n = 0
    for f in os.listdir(REF_KARATE):
        if f.endswith(".pkl") and not os.path.exists(os.path.join(run_dir, f)):
            shutil.copy(os.path.join(REF_KARATE, f), os.path.join(run_dir, f))
            n += 1
    print(f"[canonical] staged {n} shipped karate fixture files into {run_dir}")


def main():
    from gn_ode_sir_tpu.cli import monitorer

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="both",
                    choices=["karate", "wiki-vote", "both"])
    ap.add_argument("--epochs", type=int, default=500)
    args = ap.parse_args()

    jobs = []
    if args.dataset in ("karate", "both"):
        jobs.append("karate")
    if args.dataset in ("wiki-vote", "both"):
        jobs.append("wiki-vote")

    for name in jobs:
        run_dir = os.path.join(ROOT, f"Experiments-seed2-{name}")
        if name == "karate":
            prepare_karate_fixtures(run_dir)
        t0 = time.time()
        rc = monitorer.main([
            "--datasets", f"/root/reference/real_graphs/{name}",
            "--experiments_root", ROOT,
            "--epochs", str(args.epochs),
            "--seed", "0",
        ])
        print(f"[canonical] {name}: rc={rc} wall={time.time() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
