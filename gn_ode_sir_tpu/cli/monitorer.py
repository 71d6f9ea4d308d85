"""Monitorer — the experiment-matrix driver (orchestration layer L5).

Replaces ``monitorer-sim.py`` / ``monitorer-ngraphs.py``. Differences by
design: experiments run IN-PROCESS (the jit cache makes sequential runs
cheap; the reference pays a fresh CUDA+import boot per ``Popen``,
``monitorer-sim.py:191-196``), while keeping the reference semantics:

- module-level defaults identical to ``monitorer-sim.py:8-24``;
- trial parameters sampled once and persisted/reloaded via
  ``initial-{seed,beta,gamma}.pkl`` (``:146-158``);
- ``--only N ...`` to rerun selected procedures after a failure;
- a failed experiment prints the reference's marker line and the matrix
  continues (``:197-198``).

Usage:
  python -m gn_ode_sir_tpu.cli.monitorer                 # full matrix
  python -m gn_ode_sir_tpu.cli.monitorer --only 3 7      # rerun selected
  python -m gn_ode_sir_tpu.cli.monitorer --subprocess    # reference-style Popen isolation
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
import sys
import traceback

import numpy as np


@dataclasses.dataclass
class MatrixConfig:
    """The monitorer knobs (defaults = ``monitorer-sim.py:8-24``)."""

    many_graph_instances: bool = True
    epochs: int = 500
    lr: float = 1e-4
    batch_size: int = 1
    train_val_test_ratio: tuple = (0.6, 0.2, 0.2)
    n_i: tuple = (2,)
    trials_per_number: int = 200
    delta_t: float = 0.5
    max_time: int = 20
    sim: int = 10000
    hidden_dim_array: tuple = (64,)
    datasets_array: tuple = ("./real_graphs/karate",)
    model: str = "ode_nn"
    out_of_dist: bool = False
    experiments_root: str = "./multi-graph-1"
    seed: int | None = None


def random_parameters_sir(graph, n_i, trials_per_number, rng=None):
    """Sample (seed-set, beta, gamma) per trial (``monitorer-sim.py:105-121``)."""
    rng = rng or np.random.default_rng()
    i_indices, betas, gammas = [], [], []
    for k in n_i:
        for _ in range(trials_per_number):
            i_indices.append([int(i) for i in rng.choice(graph.n_nodes, k, replace=False)])
            betas.append(float(rng.uniform(0.1, 0.5)))
            gammas.append(float(rng.uniform(0.1, 0.5)))
    return i_indices, betas, gammas


def _load_or_create_params(cfg: MatrixConfig, dataset: str, path_to_save: str):
    from gn_ode_sir_tpu.graphs import load_graph

    seed_pkl = os.path.join(path_to_save, "initial-seed.pkl")
    if os.path.exists(seed_pkl):
        with open(seed_pkl, "rb") as f:
            i_indices = pickle.load(f)
        with open(os.path.join(path_to_save, "initial-beta.pkl"), "rb") as f:
            betas = pickle.load(f)
        with open(os.path.join(path_to_save, "initial-gamma.pkl"), "rb") as f:
            gammas = pickle.load(f)
        return i_indices, betas, gammas
    g = load_graph(dataset)
    rng = np.random.default_rng(cfg.seed)
    return random_parameters_sir(g, cfg.n_i, cfg.trials_per_number, rng)


def build_worker_argv(cfg: MatrixConfig, dataset, path_to_save, hidden, trial,
                      i_indices, betas, gammas) -> list[str]:
    argv = [
        "--lr", str(cfg.lr), "--epochs", str(cfg.epochs), "--hidden", str(hidden),
        "--batch_size", str(cfg.batch_size),
        "--train_val_test_ratio", *[str(r) for r in cfg.train_val_test_ratio],
        "--deltaT", str(cfg.delta_t), "--maxTime", str(cfg.max_time),
        "--sim", str(cfg.sim), "--trial", str(trial), "--dataset", dataset,
        "--path_to_save", path_to_save, "--model", cfg.model,
        # --seed pins trial sampling/splits ACROSS repeats (single-graph:
        # via the persisted pickles; multi-graph: the worker persists
        # per-graph initial-*.pkl the same way); only the model-init seed
        # varies per repeat — the reference's hidden_dim_array=[8,8,8,8]
        # runs differ only by torch's unseeded init (monitorer-ngraphs.py:20)
        "--seed", str(cfg.seed or 0),
        "--init_seed", str((cfg.seed or 0) + trial - 1),
    ]
    if i_indices:
        argv += ["--I_indices", *[str(i) for i in i_indices]]
        argv += ["--beta", *[str(b) for b in betas]]
        argv += ["--gamma", *[str(g) for g in gammas]]
    if cfg.out_of_dist:
        argv.append("--out_of_dist")
    return argv


def _newest_mtime(root: str):
    """Newest file mtime under ``root`` (None when absent/empty) — how the
    retry loop tells a checkpoint written by this job's earlier attempt from
    one left behind by a previous run."""
    newest = None
    if os.path.isdir(root):
        for r, _, files in os.walk(root):
            for f in files:
                try:
                    m = os.path.getmtime(os.path.join(r, f))
                except OSError:
                    continue
                newest = m if newest is None else max(newest, m)
    return newest


def run_matrix(cfg: MatrixConfig, only=(), use_subprocess: bool = False,
               retries: int = 0, retry_wait_s: float = 300.0,
               ensemble: bool = False) -> int:
    import itertools

    from gn_ode_sir_tpu.cli import worker

    if retries and not use_subprocess:
        # A failed device-backend init poisons the hosting process (the
        # failure is cached by the JAX bridge), so in-process retries of a
        # transient-TPU failure can never succeed: isolate every attempt.
        print("[MONITORER] --retry forces --subprocess (a failed backend "
              "init is cached per process)")
        use_subprocess = True
    if ensemble:
        # reject combinations the worker would SystemExit on (in-process
        # that would kill the whole matrix at the first job) and ones the
        # fold would silently not apply to
        if cfg.model in ("dmp", "rk"):
            raise SystemExit(
                f"--ensemble cannot drive this matrix (model={cfg.model}): "
                "the worker rejects --ensemble for untrained baselines, "
                "which have no model init to repeat")
        if not cfg.many_graph_instances:
            raise SystemExit(
                "--ensemble folds the batched repeat protocol only; the "
                "legacy per-trial node-split fan-out (--per_trial) runs "
                "sequential workers — drop one of the flags")

    # Enumerate the whole matrix up front so `total` (and `--only` numbering)
    # is correct across datasets of differing trial counts.
    all_jobs = []  # (dataset, stem, path_to_save, trial, hidden, ii, bb, gg, extra, ens)
    for dataset in cfg.datasets_array:
        stem = os.path.basename(dataset)
        multigraph = "+" in stem
        if multigraph:
            # '+'-joined datasets: per-graph label dirs live directly under the
            # experiments root (reference layout, ode_nn_ngraphs.py:319-324);
            # the worker samples/caches per-graph trial params itself.
            path_to_save = cfg.experiments_root
            os.makedirs(path_to_save, exist_ok=True)
            i_indices, betas, gammas = [], [], []
        else:
            path_to_save = os.path.join(
                cfg.experiments_root, f"Experiments-seed{cfg.n_i[0]}-{stem}"
            )
            os.makedirs(path_to_save, exist_ok=True)
            i_indices, betas, gammas = _load_or_create_params(cfg, dataset, path_to_save)

        if cfg.many_graph_instances and ensemble:
            # --ensemble: fold runs of identical hidden sizes (the repeat
            # protocol, hidden_dim_array=[8,8,8,8]) into ONE vmapped worker
            # writing the same K CSV rows (train/ensemble.py)
            jobs, trial = [], 1
            for hidden, grp in itertools.groupby(cfg.hidden_dim_array):
                k = len(list(grp))
                extra = ("--ensemble", str(k)) if k > 1 else ()
                jobs.append((trial, hidden, i_indices, betas, gammas, extra, k))
                trial += k
        elif cfg.many_graph_instances:
            # one experiment per hidden size, all trials batched inside it
            jobs = [
                (t, hidden, i_indices, betas, gammas, (), 1)
                for t, hidden in enumerate(cfg.hidden_dim_array, start=1)
            ]
        else:
            # legacy per-trial fan-out (monitorer-sim.py:160-201): one worker
            # per (trial, hidden) pair on the transductive node-split protocol
            jobs = [
                (t, hidden, [i_indices[k]], [betas[k]], [gammas[k]],
                 ("--node_split",), 1)
                for t, (k, hidden) in enumerate(
                    ((k, h) for k in range(len(i_indices))
                     for h in cfg.hidden_dim_array), start=1)
            ]
        for job in jobs:
            all_jobs.append((dataset, stem, path_to_save) + job)

    failures = 0
    total = len(all_jobs)
    for proc_num, (dataset, stem, path_to_save, trial, hidden, ii, bb, gg,
                   extra, ens) in enumerate(all_jobs, start=1):
        if only and proc_num not in only:
            continue
        argv = build_worker_argv(
            cfg, dataset, path_to_save, hidden, trial, ii, bb, gg
        ) + list(extra)
        print(f"[MONITORER] Started experiment {proc_num}/{total}: model={cfg.model} "
              f"dataset={stem} hidden={hidden}"
              + (f" ensemble={ens}" if ens > 1 else ""))
        ckpt_dir = worker.checkpoint_dir_for(path_to_save, trial, cfg.model,
                                             dataset, ensemble=ens)
        ckpt_before = _newest_mtime(ckpt_dir)
        for attempt in range(retries + 1):
            # Retry attempts resume from THIS job's periodic checkpoint
            # rather than restarting at epoch 0 — but only if an attempt of
            # this job actually wrote one. A checkpoint that predates the
            # job (e.g. a COMPLETED prior run of the same trial in the same
            # path_to_save) must NOT be resumed: fit() would restore it at
            # epoch==epochs, train zero epochs, and write the old run's
            # result as this repeat's CSV row.
            attempt_argv = list(argv)
            if attempt > 0 and "--resume" not in attempt_argv:
                now = _newest_mtime(ckpt_dir)
                if now is not None and (ckpt_before is None or now > ckpt_before):
                    attempt_argv.append("--resume")
            try:
                if use_subprocess:
                    import subprocess

                    rc = subprocess.call(
                        [sys.executable, "-m", "gn_ode_sir_tpu.cli.worker",
                         *attempt_argv]
                    )
                    if rc != 0:
                        raise RuntimeError(f"worker exited with {rc}")
                else:
                    worker.main(attempt_argv)
                break
            # SystemExit included: an in-process worker signals validation
            # failures and fault-injection drills by raising it (e.g. the
            # pinned-trial shortfall, --die_at_epoch), and SystemExit
            # subclasses BaseException — a bare `except Exception` would let
            # one failed experiment kill the whole matrix instead of
            # printing the marker line and continuing. KeyboardInterrupt
            # still propagates (the operator really does want out).
            except (Exception, SystemExit) as e:
                if isinstance(e, SystemExit) and e.code in (None, 0):
                    break  # a clean exit is a success, not a failure
                traceback.print_exc()
                if attempt == retries:
                    print("[MONITORER] Oops! Something broke!")
                    failures += 1
                else:
                    # transient-failure backoff (e.g. a tunneled TPU whose
                    # chip claim is wedged errors UNAVAILABLE for up to
                    # ~45 min); periodic checkpoints make a mid-run death
                    # resume instead of restart (--auto_checkpoint)
                    print(f"[MONITORER] attempt {attempt + 1}/{retries + 1} "
                          f"failed; retrying in {retry_wait_s:.0f}s")
                    import time

                    time.sleep(retry_wait_s)
    print(f"[MONITORER] Completed {total} procedures, {failures} failures.")
    return 1 if failures else 0


def ngraphs_config() -> MatrixConfig:
    """Multi-graph matrix defaults (``monitorer-ngraphs.py:8-23``).

    Deviation note: the reference names ``epinions`` as the unseen eval
    graph but ships no ``epinions.pkl`` (SURVEY.md §7 "reference bugs");
    ENRON — the largest shipped graph, which the reference's multigraph
    scripts already plumb label paths for (``gnn_ngraphs.py:238-239``) —
    stands in as the unseen graph (D4). Train graphs match the reference
    exactly; the stacked-Pallas2 backend handles the 33,696-node padding
    (``train/multigraph.py``).
    """
    return MatrixConfig(
        epochs=500,
        lr=1e-3,
        batch_size=8,
        hidden_dim_array=(8, 8, 8, 8),
        datasets_array=(
            "./real_graphs/dolphins+fb-food+fb-social+openflights+wiki-vote+enron",
        ),
        model="ode_nn",
    )


def main(argv=None) -> int:
    from gn_ode_sir_tpu.cli import apply_data_root_default
    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    apply_data_root_default()
    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(description="GN-ODE SIR experiment matrix")
    p.add_argument("--only", nargs="+", type=int, default=[])
    p.add_argument("--subprocess", action="store_true",
                   help="run each experiment in a subprocess (reference behavior)")
    p.add_argument("--ngraphs", action="store_true",
                   help="use the multi-graph matrix defaults (monitorer-ngraphs)")
    p.add_argument("--per_trial", action="store_true",
                   help="legacy per-trial fan-out: one node-split worker per "
                        "(trial, hidden) pair (many_graph_instances=False)")
    p.add_argument("--config", default=None,
                   help="JSON file of MatrixConfig fields (explicit flags win)")
    p.add_argument("--retry", type=int, default=0,
                   help="retry a failed experiment up to N times (forces "
                        "--subprocess: failed backend inits are cached per "
                        "process) — rides out transient device outages")
    p.add_argument("--retry_wait", type=float, default=300.0,
                   help="seconds to sleep between retry attempts")
    p.add_argument("--ensemble", action="store_true",
                   help="fold identical-hidden repeats (the protocol's "
                        "hidden_dim_array=[8,8,8,8]) into one vmapped worker "
                        "per group: one compile + one dispatch per epoch for "
                        "all K repeats, same K CSV rows. Changes --only "
                        "numbering (fewer procedures).")
    p.add_argument("--model", default=None)
    p.add_argument("--datasets", nargs="+", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--hidden", type=int, nargs="+", default=None)
    p.add_argument("--experiments_root", default=None)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    cfg = ngraphs_config() if args.ngraphs else MatrixConfig()
    if args.config:
        import json

        with open(args.config) as f:
            raw = json.load(f)
        valid = {f.name for f in dataclasses.fields(MatrixConfig)}
        unknown = set(raw) - valid
        if unknown:
            raise SystemExit(f"unknown MatrixConfig fields in {args.config}: "
                             f"{sorted(unknown)}")
        for k, v in raw.items():
            setattr(cfg, k, tuple(v) if isinstance(v, list) else v)
    if args.per_trial:
        cfg.many_graph_instances = False
    if args.model:
        cfg.model = args.model
    if args.datasets:
        cfg.datasets_array = tuple(args.datasets)
    if args.epochs is not None:
        cfg.epochs = args.epochs
    if args.trials is not None:
        cfg.trials_per_number = args.trials
    if args.hidden:
        cfg.hidden_dim_array = tuple(args.hidden)
    if args.experiments_root:
        cfg.experiments_root = args.experiments_root
    if args.seed is not None:
        cfg.seed = args.seed
    return run_matrix(cfg, only=tuple(args.only), use_subprocess=args.subprocess,
                      retries=args.retry, retry_wait_s=args.retry_wait,
                      ensemble=args.ensemble)


if __name__ == "__main__":
    raise SystemExit(main())
