"""Crash/resume drill at canonical scale (VERDICT r2 weak #5).

Drives the REAL failure mode this environment documents (a TPU worker
dying mid-run) end-to-end: a full canonical wiki-vote experiment (200
pinned trials, 500 epochs) is launched as a subprocess with periodic
Orbax checkpoints and fault injection at a target epoch; the process
dies with exit code 17; a second subprocess resumes from the checkpoint
and completes the protocol. Because resume fast-forwards the batch rng
(train/loop.py) and restores exact opt state, the final CSV row is
directly comparable to the uninterrupted round-2 canonical run
(results/canonical/.../Metrics-trials-wiki-vote: test L1 0.05672).

Usage:  python scripts/run_crash_drill.py [--die_at 250] [--epochs 500]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gn_ode_sir_tpu.cli import apply_data_root_default, monitorer  # noqa: E402

# this script calls monitorer internals directly (no main() entry point
# applies the default), and _load_or_create_params loads the graph
apply_data_root_default()

DATASET = "./real_graphs/wiki-vote"
EXP_ROOT = "results/canonical"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--die_at", type=int, default=250)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--experiments_root", default=EXP_ROOT)
    ap.add_argument("--out", default="runs_r3/crash_drill")
    args = ap.parse_args()

    cfg = monitorer.MatrixConfig(
        epochs=args.epochs, datasets_array=(DATASET,),
        experiments_root=args.experiments_root, seed=0,
    )
    path = os.path.join(args.experiments_root, "Experiments-seed2-wiki-vote")
    ii, bb, gg = monitorer._load_or_create_params(cfg, DATASET, path)
    print(f"pinned trials: {len(ii)} (from {path})", flush=True)
    base = monitorer.build_worker_argv(cfg, DATASET, path, 64, 1, ii, bb, gg)
    base += ["--checkpoint_every", "50", "--log_every", "25"]

    os.makedirs(args.out, exist_ok=True)
    crash_argv = base + ["--die_at_epoch", str(args.die_at)]
    print(f"[drill] leg 1: run-to-crash at epoch {args.die_at}", flush=True)
    with open(os.path.join(args.out, "leg1_crash.log"), "w") as log:
        rc = subprocess.call(
            [sys.executable, "-m", "gn_ode_sir_tpu.cli.worker", *crash_argv],
            stdout=log, stderr=subprocess.STDOUT,
        )
    print(f"[drill] leg 1 exit code: {rc} (expect 17)", flush=True)
    if rc != 17:
        print("[drill] FAIL: fault injection did not fire", flush=True)
        return 1

    print("[drill] leg 2: resume from periodic checkpoint", flush=True)
    with open(os.path.join(args.out, "leg2_resume.log"), "w") as log:
        rc = subprocess.call(
            [sys.executable, "-m", "gn_ode_sir_tpu.cli.worker", *base,
             "--resume"],
            stdout=log, stderr=subprocess.STDOUT,
        )
    print(f"[drill] leg 2 exit code: {rc} (expect 0)", flush=True)
    if rc != 0:
        return 1
    # surface the resumed run's final protocol line + CSV tail
    with open(os.path.join(args.out, "leg2_resume.log")) as f:
        lines = [ln for ln in f
                 if ln.startswith(("resumed", "Test Loss", "Epoch"))]
    print("".join(lines[:2] + lines[-4:]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
