"""Settle the round-4 SpMM drift: kernel regression vs tunnel noise.

Round 4's driver-captured ``spmm_apply_ms_wikivote`` drifted 1.887 ms ->
4.07 ms across same-code validations (VERDICT r4 weak #4). Code forensics
first: the ONLY post-1.887 change to ``ops/pallas_spmm2.py`` is the
backward-residual fix (ba57a2c..954a70c, 7 lines in ``_spmm2_diff_fwd/bwd``)
— the forward apply the bench times is byte-identical, so a code regression
is impossible unless lowering changed. This probe supplies the measurement
half: N process-internal rounds of best-of-8 SpMM walls INTERLEAVED with a
session-health control (the headline MC-sim metric, whose round-4 spread is
known: 161k-192k sims/s). If SpMM walls track the control across rounds,
the drift is the tunnel; a stable control with slow SpMM would indict the
kernel.

Usage (TPU):
  nohup python -u scripts/probe_spmm_drift.py > runs_r5/probe_spmm_drift.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax

    import bench
    from gn_ode_sir_tpu.graphs import load_graph

    wiki = load_graph(os.path.join(bench.GRAPHS, "wiki-vote"))
    ofl = load_graph(os.path.join(bench.GRAPHS, "openflights"))
    rounds = int(os.environ.get("GN_DRIFT_ROUNDS", "4"))

    rows = []
    for r in range(rounds):
        t0 = time.perf_counter()
        spmm_s = bench.measure_spmm_apply(wiki, repeats=8)
        spmm_wall = time.perf_counter() - t0
        sims_per_sec, _ = bench.measure_ours(ofl, repeats=4)
        row = {
            "round": r,
            "spmm_apply_ms": round(spmm_s * 1e3, 4),
            "spmm_phase_wall_s": round(spmm_wall, 2),
            "control_sims_per_sec": round(sims_per_sec, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    ms = [r["spmm_apply_ms"] for r in rows]
    ctl = [r["control_sims_per_sec"] for r in rows]
    result = {
        "kernel_forensics": (
            "forward path identical ba57a2c..HEAD (only _spmm2_diff_fwd/bwd "
            "residual shapes changed: git diff ba57a2c 954a70c -- "
            "gn_ode_sir_tpu/ops/pallas_spmm2.py)"),
        "rounds": rows,
        "spmm_apply_ms_min": min(ms),
        "spmm_apply_ms_max": max(ms),
        "control_sims_per_sec_min": min(ctl),
        "control_sims_per_sec_max": max(ctl),
        "backend": jax.default_backend(),
    }
    out = os.path.join(REPO, "runs_r5", "probe_spmm_drift.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
