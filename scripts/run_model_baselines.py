"""Append baseline model-family rows to a canonical experiment's CSV.

Drives the monitorer once per requested model against a dataset's existing
canonical experiment directory (trial parameters load from the persisted
``initial-*.pkl``; labels from the cache), so every family's row in
``Metrics-trials-<dataset>`` shares the same trials. Used to produce the
all-model tables in RESULTS.md (karate, wiki-vote, and the dmp/rk columns
of the canonical table).

Usage:
  python scripts/run_model_baselines.py --dataset wiki-vote \\
      [--models GCN GIN dmp rk] [--root ./results/canonical]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from gn_ode_sir_tpu.cli import apply_data_root_default, monitorer

    apply_data_root_default()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    help="graph stem (e.g. wiki-vote) or full path")
    ap.add_argument("--models", nargs="+", default=["GCN", "GIN", "dmp", "rk"])
    ap.add_argument("--root", default="./results/canonical")
    ap.add_argument("--epochs", type=int, default=500)
    args = ap.parse_args()

    dataset = args.dataset
    if "/" not in dataset:
        dataset = f"/root/reference/real_graphs/{dataset}"

    for model in args.models:
        cfg = monitorer.MatrixConfig(
            model=model, seed=0, epochs=args.epochs,
            datasets_array=(dataset,), experiments_root=args.root,
        )
        t0 = time.time()
        rc = monitorer.run_matrix(cfg)
        print(f"[model-baselines] {args.dataset}/{model}: rc={rc} "
              f"wall={time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
