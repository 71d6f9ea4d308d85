"""Self-healing round-4 evidence queue (rebuilt after the VM reboot wiped /tmp).

Each cycle re-reads the enron ngraphs CSV and runs the FIRST missing item,
one TPU client at a time, with bounded sleep-and-retry on failure (the
CLAUDE.md rules: never kill a TPU client, worker-as-probe, one chip):

  1. ode_nn trial 3 (resume from its mid-run checkpoint)
  2. ode_nn trial 4
  3. GCN row (trial 1)
  4. GIN row (trial 1)
  5. scripts/probe_mg_epoch.py  -> runs_r4/probe_mg_epoch.json
  6. python bench.py            -> BENCH_DETAILS.json refresh

"Done" for 1-4 = a CSV row with that (model, trial) at epochs=500 in
runs_r3/ngraphs_enron/Metrics-trials-...; for 5 = the JSON artifact exists;
for 6 = bench_r4_clean.json exists (wrapper rc=0).

Usage:  nohup python -u scripts/chain_r4.py > runs_r4/chain.log 2>&1 &
"""

from __future__ import annotations

import csv
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_DIR = os.path.join(REPO, "runs_r3", "ngraphs_enron")
CSV_PATH = os.path.join(
    RUN_DIR, "Metrics-trials-dolphins+fb-food+fb-social+openflights+wiki-vote+enron"
)
DATASET = "./real_graphs/dolphins+fb-food+fb-social+openflights+wiki-vote+enron"
PROBE_JSON = os.path.join(REPO, "runs_r4", "probe_mg_epoch.json")
BENCH_MARK = os.path.join(REPO, "runs_r4", "bench_r4_clean.json")

MAX_CYCLES = 60
RETRY_WAIT_S = 300.0


def done_rows():
    rows = set()
    if not os.path.exists(CSV_PATH):
        return rows
    with open(CSV_PATH) as f:
        for row in csv.DictReader(f):
            try:
                if int(row["epochs"]) == 500:
                    rows.add((row["model"], int(row["trial"])))
            except (KeyError, ValueError):
                continue
    return rows


def worker_argv(model: str, trial: int, resume: bool) -> list[str]:
    argv = [
        sys.executable, "-u", "-m", "gn_ode_sir_tpu.cli.worker",
        "--lr", "0.001", "--epochs", "500", "--hidden", "8",
        "--batch_size", "8", "--train_val_test_ratio", "0.6", "0.2", "0.2",
        "--deltaT", "0.5", "--maxTime", "20", "--sim", "10000",
        "--trial", str(trial), "--dataset", DATASET,
        "--path_to_save", "./runs_r3/ngraphs_enron", "--model", model,
        "--seed", "0", "--init_seed", str(trial - 1),
    ]
    if resume:
        argv.append("--resume")
    return argv


def next_job():
    """(name, argv) of the first missing queue item, or None when drained."""
    have = done_rows()
    for trial in (3, 4):
        if ("ode_nn", trial) not in have:
            # --resume is a no-op without a checkpoint; a COMPLETED prior run
            # of the same trial would already have a CSV row and be skipped.
            return (f"ode_nn-trial{trial}",
                    worker_argv("ode_nn", trial, resume=True))
    for model in ("GCN", "GIN"):
        if (model, 1) not in have:
            return (f"{model}-trial1", worker_argv(model, 1, resume=True))
    if not os.path.exists(PROBE_JSON):
        # the probe writes runs_r4/probe_mg_epoch.json itself
        return ("probe_mg_epoch",
                [sys.executable, "-u", os.path.join(REPO, "scripts", "probe_mg_epoch.py")])
    if not os.path.exists(BENCH_MARK):
        return ("bench", [sys.executable, "-u", os.path.join(REPO, "bench.py")])
    return None


def main() -> int:
    os.chdir(REPO)
    for cycle in range(1, MAX_CYCLES + 1):
        job = next_job()
        if job is None:
            print(f"[chain] queue drained after {cycle - 1} cycles", flush=True)
            return 0
        name, argv = job
        print(f"[chain] cycle {cycle}/{MAX_CYCLES}: {name}: {' '.join(argv)}",
              flush=True)
        t0 = time.time()
        rc = subprocess.call(argv)
        dt = time.time() - t0
        print(f"[chain] {name} rc={rc} after {dt:.0f}s", flush=True)
        if name == "bench" and rc == 0:
            with open(BENCH_MARK, "w") as f:
                f.write('{"rc": 0}\n')
        if rc != 0:
            print(f"[chain] sleeping {RETRY_WAIT_S:.0f}s before re-probe", flush=True)
            time.sleep(RETRY_WAIT_S)
    print("[chain] cycle budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
