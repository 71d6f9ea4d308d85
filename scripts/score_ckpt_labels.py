"""Score a trained ngraphs checkpoint against a label-cache directory.

Label-realization attribution probe (round 4): the wiki-vote-unseen rerun
under the node-view default landed test 0.1085 vs round 3's 0.0855 for the
same pinned trial params — but round 3's label caches were not kept, so the
rerun re-extracted labels (a fresh MC draw; ADVICE.md r3 #4 documents the
coins='auto' reproducibility caveat).  A full-width control with the SAME
fresh labels landed 0.1226, exonerating the node view.  This script closes
the attribution: evaluate the ROUND-3 trained parameters (its committed
Orbax checkpoint) against the FRESH labels.  If the r3 model also scores
~0.11+ here, the gap is the label/test-set realization, not training-path
quality drift.

Usage (TPU, ~1 min):
  python scripts/score_ckpt_labels.py \
      --ckpt results/ngraphs_r3/ckpt-trial1-ode_nn-mg-dolphins-fb-food-fb-social-openflights-wiki-vote \
      --labels runs_r4/ngraphs_wv_nv
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRAPHS = ["dolphins", "fb-food", "fb-social", "openflights", "wiki-vote"]
DATASET = "./real_graphs/" + "+".join(GRAPHS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--labels", required=True,
                    help="run dir holding Experiments-seed2-<graph> caches")
    ap.add_argument("--out", default="runs_r4/score_ckpt_labels.json")
    args = ap.parse_args()

    import jax
    import optax

    from gn_ode_sir_tpu.cli import apply_data_root_default
    from gn_ode_sir_tpu.graphs import load_graphs
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.train import (
        assemble_multigraph_trials,
        multigraph_auto_fns,
        multigraph_split,
    )
    from gn_ode_sir_tpu.train.checkpoint import restore_checkpoint
    from gn_ode_sir_tpu.train.data import epoch_batches_grouped
    from gn_ode_sir_tpu.train.loop import _data_to_device, make_eval_fn

    apply_data_root_default()
    graphs = load_graphs(DATASET)
    per_graph, label_dirs, counts = [], [], []
    for g in GRAPHS:
        d = os.path.join(args.labels, f"Experiments-seed2-{g}")
        seeds = pickle.load(open(os.path.join(d, "initial-seed.pkl"), "rb"))
        betas = pickle.load(open(os.path.join(d, "initial-beta.pkl"), "rb"))
        gammas = pickle.load(open(os.path.join(d, "initial-gamma.pkl"), "rb"))
        per_graph.append(list(zip(seeds, betas, gammas)))
        label_dirs.append(d)
        counts.append(len(seeds))
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, label_dirs=label_dirs, sim=10000, max_time=20,
        rng_key=jax.random.PRNGKey(0))
    conn = multigraph_auto_fns(batch)
    _, va, te = multigraph_split(counts)

    model = GNODE(hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optax.adam(1e-3).init(params)
    target = {"params": params, "opt_state": opt_state, "epoch": 0,
              "best_val": 0.0, "best_epoch": 0, "test_loss": 0.0}
    st = restore_checkpoint(os.path.abspath(args.ckpt), target)
    print(f"checkpoint epoch={st['epoch']} best_val={st['best_val']:.5f} "
          f"best_epoch={st['best_epoch']} recorded_test={st['test_loss']:.5f}",
          flush=True)

    d = _data_to_device(data)
    d["__adj_aux__"] = jax.tree_util.tree_map(jax.numpy.asarray, conn.aux)
    evaluate = make_eval_fn(model, conn.eval_adj_fn, conn.node_mask_fn)
    out = {"ckpt": args.ckpt, "labels": args.labels,
           "ckpt_epoch": int(st["epoch"]),
           "ckpt_best_val": float(st["best_val"]),
           "ckpt_recorded_test": float(st["test_loss"])}
    for name, idx in (("val", va), ("test", te)):
        bi, bw = epoch_batches_grouped(idx, data.graph_idx, 8, None)
        loss = float(np.asarray(evaluate(st["params"], d, bi, bw)))
        out[f"{name}_loss_on_these_labels"] = loss
        print(f"{name} loss on {args.labels} labels: {loss:.5f}", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
