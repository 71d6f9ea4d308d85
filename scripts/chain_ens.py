"""Round-4c evidence queue: the wv-unseen transfer matrix in ENSEMBLE mode.

Runs the reference's full repeat protocol (4 init seeds per model family,
`monitorer-ngraphs.py:20`) as ONE vmapped worker per family
(`--ensemble 4`, train/ensemble.py) on the wiki-vote-unseen config, so the
end-to-end matrix wall can be compared with the sequential runs chain_r4b
landed (`runs_r4/ngraphs_wv_nv`).

CSV-driven like chain_r4b: a family is done when trials 1-4 at epochs=500
exist in the run dir's Metrics CSV. One TPU client at a time (waits for a
pre-existing pid in /tmp/wv_ens.pid), bounded sleep-and-retry, never kills,
--resume only on re-attempts whose checkpoint advanced since this process
launched the job (CLAUDE.md rules).

Usage:  nohup python -u scripts/chain_ens.py > runs_r4/chain_ens.log 2>&1 &
"""
from __future__ import annotations

import csv
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CONFIGS = {
    "wv": ("dolphins+fb-food+fb-social+openflights+wiki-vote",
           "ngraphs_wv_ens"),
    "enron": ("dolphins+fb-food+fb-social+openflights+wiki-vote+enron",
              "ngraphs_en_ens"),
}
_cfg = CONFIGS[sys.argv[1] if len(sys.argv) > 1 else "wv"]
GRAPHS, _dirname = _cfg
RUN_DIR = os.path.join(REPO, "runs_r4", _dirname)
CSV_PATH = os.path.join(RUN_DIR, f"Metrics-trials-{GRAPHS}")
MODELS = ["ode_nn", "GCN", "GIN"]
MAX_CYCLES = 30
RETRY_WAIT_S = 300.0


def done_models() -> set:
    done = set()
    if not os.path.exists(CSV_PATH):
        return done
    by_model: dict[str, set] = {}
    with open(CSV_PATH) as f:
        for row in csv.DictReader(f):
            try:
                if int(row["epochs"]) == 500:
                    by_model.setdefault(row["model"], set()).add(int(row["trial"]))
            except (KeyError, ValueError):
                continue
    for m, trials in by_model.items():
        if {1, 2, 3, 4} <= trials:
            done.add(m)
    return done


def worker_argv(model: str) -> list:
    return [
        sys.executable, "-u", "-m", "gn_ode_sir_tpu.cli.worker",
        "--lr", "0.001", "--epochs", "500", "--hidden", "8",
        "--batch_size", "8", "--train_val_test_ratio", "0.6", "0.2", "0.2",
        "--deltaT", "0.5", "--maxTime", "20", "--sim", "10000",
        "--trial", "1", "--dataset", f"./real_graphs/{GRAPHS}",
        "--path_to_save", f"./runs_r4/{_dirname}", "--model", model,
        "--seed", "0", "--init_seed", "0", "--ensemble", "4",
        "--log_every", "25",
    ]


def ckpt_dir(model: str) -> str:
    # single source of truth for the naming (incl. the -ensK suffix): a
    # scheme drift here would silently break the --resume mtime gate
    from gn_ode_sir_tpu.cli.worker import checkpoint_dir_for

    return checkpoint_dir_for(RUN_DIR, 1, model, GRAPHS, ensemble=4)


def newest_mtime(root: str):
    from gn_ode_sir_tpu.cli.monitorer import _newest_mtime

    return _newest_mtime(root)


# Pid files other launchers on this box write for their TPU clients (the
# one-chip rule: never two TPU jobs at once). Best-effort — covers the
# operator convention `... & echo $! > /tmp/<name>.pid`.
FOREIGN_PID_FILES = ("/tmp/wv_ens.pid", "/tmp/en_probe.pid",
                     "/tmp/bench.pid", "/tmp/chain_ens.pid")


def wait_for_foreign_client():
    """Block while any pre-existing TPU client (pid file) is alive."""
    me = os.getpid()
    for pid_file in FOREIGN_PID_FILES:
        try:
            with open(pid_file) as f:
                pid = int(f.read().strip())
        except (OSError, ValueError):
            continue
        if pid == me or pid == os.getppid():
            continue
        while True:
            try:
                os.kill(pid, 0)
            except OSError:
                break
            print(f"[CHAIN-ENS] waiting for running TPU client pid {pid} "
                  f"({pid_file})", flush=True)
            time.sleep(60)


def main() -> int:
    os.chdir(REPO)
    wait_for_foreign_client()
    attempts: dict[str, int] = {}
    baseline_mtime = {m: newest_mtime(ckpt_dir(m)) for m in MODELS}
    for cycle in range(1, MAX_CYCLES + 1):
        done = done_models()
        todo = [m for m in MODELS if m not in done]
        if not todo:
            print(f"[CHAIN-ENS] all families complete: {sorted(done)}",
                  flush=True)
            return 0
        model = todo[0]
        attempts[model] = attempts.get(model, 0) + 1
        argv = worker_argv(model)
        now = newest_mtime(ckpt_dir(model))
        base = baseline_mtime[model]
        if attempts[model] > 1 and now is not None and (
                base is None or now > base):
            argv.append("--resume")
        log = os.path.join(RUN_DIR, f"ens_{model}.log")
        print(f"[CHAIN-ENS] cycle {cycle}: {model} attempt "
              f"{attempts[model]} (resume={'--resume' in argv}) -> {log}",
              flush=True)
        t0 = time.time()
        with open(log, "a") as lf:
            rc = subprocess.call(argv, stdout=lf, stderr=subprocess.STDOUT)
        print(f"[CHAIN-ENS] {model} rc={rc} wall={time.time() - t0:.0f}s",
              flush=True)
        if rc != 0:
            print(f"[CHAIN-ENS] sleeping {RETRY_WAIT_S:.0f}s before retry",
                  flush=True)
            time.sleep(RETRY_WAIT_S)
    print("[CHAIN-ENS] cycle budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
