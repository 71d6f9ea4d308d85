"""Self-healing round-4b evidence queue: complete the model-family transfer
matrices at the reference's full 4-repeat protocol (monitorer-ngraphs.py:20
runs hidden_dim_array=[8,8,8,8] per model family; gnn_ngraphs.py is the
GCN/GIN script it dispatches).

Queue (first missing item each cycle, CSV-driven like chain_r4.py):
  1. wiki-vote-unseen node-view config: GCN trials 1-4, GIN trials 1-4
     (runs_r4/ngraphs_wv_nv — ode_nn 1-4 already landed; labels cached)
  2. enron-unseen config: GCN trials 2-4, GIN trials 2-4
     (runs_r3/ngraphs_enron — ode_nn 1-4 + GCN/GIN trial 1 already landed)

One TPU client at a time, bounded sleep-and-retry on failure, never kills
(CLAUDE.md rules). --resume follows the monitorer's mtime gate: it is added
only on RE-attempts of a job whose checkpoint advanced since this process
first launched it — a checkpoint that predates the job (e.g. a COMPLETED
prior run of the same (model, trial) whose CSV row was trimmed to re-drive
the repeat) must not be restored as the fresh repeat's result.

Usage:  nohup python -u scripts/chain_r4b.py > runs_r4/chain_r4b.log 2>&1 &
"""

from __future__ import annotations

import csv
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WV_GRAPHS = "dolphins+fb-food+fb-social+openflights+wiki-vote"
EN_GRAPHS = WV_GRAPHS + "+enron"

CONFIGS = {
    "wv": {
        "run_dir": os.path.join(REPO, "runs_r4", "ngraphs_wv_nv"),
        "csv": f"Metrics-trials-{WV_GRAPHS}",
        "dataset": f"./real_graphs/{WV_GRAPHS}",
        "path_to_save": "./runs_r4/ngraphs_wv_nv",
        "jobs": [(m, t) for m in ("GCN", "GIN") for t in (1, 2, 3, 4)],
    },
    "enron": {
        "run_dir": os.path.join(REPO, "runs_r3", "ngraphs_enron"),
        "csv": f"Metrics-trials-{EN_GRAPHS}",
        "dataset": f"./real_graphs/{EN_GRAPHS}",
        "path_to_save": "./runs_r3/ngraphs_enron",
        "jobs": [(m, t) for m in ("GCN", "GIN") for t in (2, 3, 4)],
    },
}

MAX_CYCLES = 80
RETRY_WAIT_S = 300.0


def done_rows(cfg) -> set:
    rows = set()
    path = os.path.join(cfg["run_dir"], cfg["csv"])
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for row in csv.DictReader(f):
            try:
                if int(row["epochs"]) == 500:
                    rows.add((row["model"], int(row["trial"])))
            except (KeyError, ValueError):
                continue
    return rows


def worker_argv(cfg, model: str, trial: int) -> list:
    return [
        sys.executable, "-u", "-m", "gn_ode_sir_tpu.cli.worker",
        "--lr", "0.001", "--epochs", "500", "--hidden", "8",
        "--batch_size", "8", "--train_val_test_ratio", "0.6", "0.2", "0.2",
        "--deltaT", "0.5", "--maxTime", "20", "--sim", "10000",
        "--trial", str(trial), "--dataset", cfg["dataset"],
        "--path_to_save", cfg["path_to_save"], "--model", model,
        "--seed", "0", "--init_seed", str(trial - 1),
    ]


def next_job():
    for key in ("wv", "enron"):
        cfg = CONFIGS[key]
        have = done_rows(cfg)
        for model, trial in cfg["jobs"]:
            if (model, trial) not in have:
                return (f"{key}-{model}-trial{trial}", cfg, model, trial)
    return None


def main() -> int:
    os.chdir(REPO)
    # --resume mtime gate (shared logic with cli.monitorer.run_matrix): the
    # checkpoint mtime at a job's FIRST launch in this process; later
    # attempts resume only if the checkpoint advanced past it.
    from gn_ode_sir_tpu.cli.monitorer import _newest_mtime
    from gn_ode_sir_tpu.cli.worker import checkpoint_dir_for

    ckpt_baseline: dict = {}
    for cycle in range(1, MAX_CYCLES + 1):
        job = next_job()
        if job is None:
            print(f"[chain] queue drained after {cycle - 1} cycles", flush=True)
            return 0
        name, cfg, model, trial = job
        argv = worker_argv(cfg, model, trial)
        ckpt_dir = checkpoint_dir_for(
            cfg["path_to_save"], trial, model, cfg["dataset"]
        )
        if name not in ckpt_baseline:
            ckpt_baseline[name] = _newest_mtime(ckpt_dir)
        else:
            now = _newest_mtime(ckpt_dir)
            before = ckpt_baseline[name]
            if now is not None and (before is None or now > before):
                argv.append("--resume")
        print(f"[chain] cycle {cycle}/{MAX_CYCLES}: {name}: {' '.join(argv)}",
              flush=True)
        t0 = time.time()
        rc = subprocess.call(argv)
        dt = time.time() - t0
        print(f"[chain] {name} rc={rc} after {dt:.0f}s", flush=True)
        if rc != 0:
            print(f"[chain] sleeping {RETRY_WAIT_S:.0f}s before re-probe",
                  flush=True)
            time.sleep(RETRY_WAIT_S)
    print("[chain] cycle budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
