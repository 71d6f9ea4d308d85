"""Summarize multigraph-transfer repeats: mean +/- std of unseen-graph test
L1 over the pinned-trial repeats in a Metrics CSV.

Repeats of one ngraphs experiment share --seed (identical trial sets; the
per-graph params are pinned by the persisted initial-*.pkl) and vary only
--init_seed, so the spread below is INIT variance — the reference's repeat
semantics (its torch init is unseeded). Rows with epochs <= 2 are smoke
runs and excluded.

Usage: python scripts/summarize_ngraphs.py <Metrics-trials-... CSV>
           [--model ode_nn | --all-models]
"""

from __future__ import annotations

import argparse
import csv


def summarize(path: str, model: str = "ode_nn"):
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            if r["model"] != model or int(r["epochs"]) <= 2:
                continue
            rows.append(r)
    if not rows:
        raise SystemExit(f"no {model} rows with epochs > 2 in {path}")
    losses = [float(r["test_loss"]) for r in rows]
    m = sum(losses) / len(losses)
    sq = sum((x - m) ** 2 for x in losses)
    sd = (sq / max(len(losses) - 1, 1)) ** 0.5  # sample (ddof=1)
    sd_pop = (sq / len(losses)) ** 0.5
    for r, x in zip(rows, losses):
        base = float(r["loss_baseline"])
        extra = f"  (RK baseline {base:.4f})" if base else ""
        print(f"trial {r['trial']}: test L1 {x:.4f}  best epoch "
              f"{r['best_epoch']}  {float(r['n_ode_time']):.2f} s/epoch{extra}")
    print(f"{model}: {m:.4f} +/- {sd:.4f} (sample sd; population "
          f"{sd_pop:.4f}) over {len(losses)} repeats")
    return m, sd, len(losses)


def summarize_all(path: str):
    """One line per model family present in the CSV (the round's
    model-family transfer table: GN-ODE vs GCN vs GIN on the unseen graph)."""
    models = []
    with open(path) as f:
        for r in csv.DictReader(f):
            if int(r["epochs"]) > 2 and r["model"] not in models:
                models.append(r["model"])
    out = {}
    for m in models:
        print()
        out[m] = summarize(path, m)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--model", default="ode_nn")
    ap.add_argument("--all-models", action="store_true",
                    help="summarize every model family in the CSV")
    args = ap.parse_args()
    if args.all_models:
        summarize_all(args.csv)
    else:
        summarize(args.csv, args.model)
