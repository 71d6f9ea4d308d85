"""Probe: where the enron multigraph train epoch (~3.77 s r3) spends time.

The one hot path without a published breakdown (VERDICT r3 weak #6). The
epoch is 23 grouped steps at batch 8; each GNODE step runs euler over
maxTime/deltaT = 40 f-evals, each f-eval one stacked-Pallas2 SpMM pass whose
kernel grid traverses the batch graph's chunk plan. This decomposes:

1. whole train epoch (best-of-3) — the number to cut;
2. kernel floor: the same count of stacked-plan matvecs (23 x 40), chained
   inside one jitted scan at the same message width (batch*hidden), per
   train graph in its epoch proportion — time attributable to SpMM grid
   traversals alone;
3. levers: the round-3 padded chunk grid (per_graph_grid=False — every
   step pays the stack-max chunk count; the new per-graph lax.switch grid
   is the default and is what item 1 measures), bf16 kernel messages (plan
   precision knob), batch size 8/16/24 (bigger grouped batches = fewer
   grid passes per epoch; NOTE batch size is part of the training
   protocol — this measures throughput headroom, not a drop-in default
   change);
4. eval share: one unseen-graph eval pass (runs every epoch in fit()).

epoch - kernel_floor ~= solver + encode/decode + loss/opt overhead. If the
floor dominates, the epoch is gather/dispatch-bound like the other two hot
paths (RESULTS.md roofline table) and the lever is the kernel itself.

Run ON TPU (one chip — nothing else running):
  nohup python -u scripts/probe_mg_epoch.py > /tmp/probe_mg_epoch.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATASET = ("/root/reference/real_graphs/"
           "dolphins+fb-food+fb-social+openflights+wiki-vote+enron")
RUN_DIR = "runs_r3/ngraphs_enron"
COUNTS = [36, 36, 36, 36, 36, 120]
HIDDEN = 8
F_EVALS = 40  # euler over maxTime/deltaT


def _load_trials(names):
    per_graph = []
    label_dirs = [os.path.join(RUN_DIR, f"Experiments-seed2-{n}") for n in names]
    for g_i, d in enumerate(label_dirs):
        with open(os.path.join(d, "initial-seed.pkl"), "rb") as f:
            ii = pickle.load(f)
        with open(os.path.join(d, "initial-beta.pkl"), "rb") as f:
            bb = pickle.load(f)
        with open(os.path.join(d, "initial-gamma.pkl"), "rb") as f:
            gg = pickle.load(f)
        per_graph.append([(list(ii[k]), float(bb[k]), float(gg[k]))
                          for k in range(COUNTS[g_i])])
    return per_graph, label_dirs


def main(smoke: bool = False, eval_only: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from gn_ode_sir_tpu.graphs import load_graphs
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.train import (
        assemble_multigraph_trials,
        multigraph_pallas2_fns,
        multigraph_split,
    )
    from gn_ode_sir_tpu.train.data import epoch_batches_grouped
    from gn_ode_sir_tpu.train.loop import (
        _data_to_device,
        make_eval_fn,
        make_train_epoch_fn,
    )

    global COUNTS
    if smoke:
        # tiny CPU shakedown of the whole measurement path (no TPU, no
        # enron-scale labels): 2 small graphs, generated trials
        COUNTS = [8, 10]
        graphs = load_graphs("/root/reference/real_graphs/dolphins+fb-food")
        rng = np.random.default_rng(0)
        per_graph = [
            [([int(x) for x in rng.choice(g.n_nodes, 2, replace=False)],
              float(rng.uniform(0.1, 0.5)), float(rng.uniform(0.1, 0.5)))
             for _ in range(c)]
            for g, c in zip(graphs, COUNTS)
        ]
        label_dirs = None
        names = [g.name for g in graphs]
    else:
        graphs = load_graphs(DATASET)
        names = [g.name for g in graphs]
        per_graph, label_dirs = _load_trials(names)
    batch, data = assemble_multigraph_trials(
        graphs, per_graph, label_dirs=label_dirs,
        sim=200 if smoke else 10000, max_time=20,
        rng_key=jax.random.PRNGKey(0),
    )
    print(f"padded to n={batch.n_max}, e={batch.e_max}", flush=True)
    tr, va, _ = multigraph_split(COUNTS)
    model = GNODE(hidden=HIDDEN)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    results = {}

    # smoke runs must NOT write the real evidence path — the retry chain
    # gates the TPU probe on runs_r4/probe_mg_epoch.json existing, and
    # RESULTS.md cites it as the measured A/B
    out_path = ("runs_r4/probe_mg_epoch_smoke.json" if smoke
                else "runs_r4/probe_mg_epoch.json")
    os.makedirs("runs_r4", exist_ok=True)

    def flush():
        # merge-write so an --eval-only rerun (fresh process, after the
        # cascading b24 OOM starved the first run's eval pass) patches its
        # keys into the full run's artifact instead of clobbering it
        results["smoke"] = smoke
        merged = {}
        if os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    merged = json.load(f)
            except Exception:  # noqa: BLE001 — corrupt partials lose
                merged = {}
        # DEEP merge per top-level key: a lever rerun re-measures the base
        # epoch without its utilization sub-dict; a shallow update would
        # clobber the nested evidence (it once erased epoch_f32_b8's
        # mfu/hbm_frac from the committed artifact)
        for k, v in results.items():
            if isinstance(v, dict) and isinstance(merged.get(k), dict):
                merged[k] = {**merged[k], **v}
            else:
                merged[k] = v
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1)

    def time_epoch(precision, bs, tag, per_graph_grid=True, **plan_kw):
        adj_fn, eval_adj_fn, node_mask_fn, adj_aux = multigraph_pallas2_fns(
            batch, precision=precision, per_graph_grid=per_graph_grid,
            **plan_kw)
        d = _data_to_device(data)
        d["__adj_aux__"] = jax.tree_util.tree_map(jnp.asarray, adj_aux)
        opt_state = optimizer.init(params)
        train_epoch = make_train_epoch_fn(model, optimizer, adj_fn, node_mask_fn,
                                          n_view=getattr(adj_fn, "n_view", None))
        bi, bw = epoch_batches_grouped(tr, data.graph_idx, bs,
                                       np.random.default_rng(0))
        key = jax.random.PRNGKey(1)

        def run():
            p, o, loss = train_epoch(params, opt_state, d, bi, bw, key)
            return float(np.asarray(loss))

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        results[tag] = {"epoch_s": best, "steps": int(bi.shape[0]),
                        "batch": bs, "precision": precision,
                        "per_graph_grid": per_graph_grid,
                        "compile_s": compile_s, **plan_kw}
        print(f"{tag}: {bi.shape[0]} steps @ batch {bs} prec={precision}: "
              f"{best:.3f}s (compile {compile_s:.0f}s)", flush=True)
        return adj_fn, eval_adj_fn, node_mask_fn, d, bi

    # GN_PROBE_LEVERS=tag1,tag2 reruns ONLY those levers (plus the base
    # epoch they compare against), merge-patching the artifact — each lever
    # costs a multi-minute remote compile, so measuring one new lever must
    # not re-pay for the whole grid. Add "eval"/"floor" to the list to
    # include those sections.
    only = os.environ.get("GN_PROBE_LEVERS")
    only = set(only.split(",")) if only else None

    if eval_only:
        # fresh-process patch run: measure ONLY the eval pass (+ fold16
        # lever) and merge into the existing artifact — the full run's
        # eval measurement was starved by the cascading b24 OOM
        _, eval_adj_fn, node_mask_fn, adj_aux = multigraph_pallas2_fns(
            batch, precision="f32")
        d = _data_to_device(data)
        d["__adj_aux__"] = jax.tree_util.tree_map(jnp.asarray, adj_aux)
    else:
        adj_fn, eval_adj_fn, node_mask_fn, d, bi = time_epoch("f32", 8, "epoch_f32_b8")

        if only is None or "floor" in only:
            # kernel floor: same matvec count/widths as the f32 b8 epoch, nothing
            # else. Steps group by graph; count steps per train graph from bi's rows.
            gi_rows = np.asarray(data.graph_idx)[np.asarray(bi[:, 0])]
            aux = d["__adj_aux__"]
            floor_total = 0.0
            for g_i in sorted(set(int(g) for g in gi_rows)):
                n_steps = int((gi_rows == g_i).sum())
                chain = n_steps * F_EVALS
                adj = adj_fn(jnp.full((8,), g_i, jnp.int32), aux)
                x0 = jnp.asarray(
                    np.random.default_rng(0).random((8, batch.n_max, HIDDEN)),
                    jnp.float32)

                # adj rides in as a jit ARGUMENT — closure-captured device arrays
                # become HLO constants and blow the remote compile (CLAUDE.md); the
                # real epoch path threads adj_aux as an argument too, so this keeps
                # the floor measurement comparable
                @partial(jax.jit, static_argnames=("length",))
                def run_chain(adj, x, length):
                    def body(y, _):
                        y = adj.matvec(y)
                        return y / (jnp.abs(y).max() + 1e-6), None
                    y, _ = jax.lax.scan(body, x, None, length=length)
                    return y

                float(np.asarray(run_chain(adj, x0, chain)).sum())  # compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(np.asarray(run_chain(adj, x0, chain)).sum())
                    best = min(best, time.perf_counter() - t0)
                floor_total += best
                print(f"  kernel floor graph {g_i} ({names[g_i]}): {n_steps} steps "
                      f"x {F_EVALS} matvecs = {chain}: {best:.3f}s", flush=True)
            results["kernel_floor_s"] = floor_total
            print(f"kernel floor total: {floor_total:.3f}s "
                  f"({100 * floor_total / results['epoch_f32_b8']['epoch_s']:.0f}% "
                  f"of epoch)", flush=True)

            # absolute utilization vs the v5e roofline (utils/roofline.py)
            from gn_ode_sir_tpu.utils.roofline import mg_train_epoch_model, utilization

            steps_edges = [
                (int((gi_rows == g_i).sum()), len(graphs[g_i].src))
                for g_i in sorted(set(int(g) for g in gi_rows))
            ]
            util = utilization(
                mg_train_epoch_model(batch.n_max, HIDDEN, 8, steps_edges, F_EVALS),
                results["epoch_f32_b8"]["epoch_s"],
            )
            results["epoch_f32_b8"]["utilization"] = util
            print(f"epoch utilization: mfu={util['mfu']:.4f} "
                  f"hbm_frac={util['hbm_frac']:.4f}", flush=True)

        # levers (epoch_f32_b8 above already runs the round-4 default:
        # per-graph chunk grids via Pallas2SwitchAdj). A lever can legitimately
        # OOM at enron scale (b24 hit RESOURCE_EXHAUSTED on the first full run) —
        # record the failure and keep going instead of losing the whole probe,
        # and flush results to disk after every lever so a hard crash still
        # leaves the partial artifact.
        def try_epoch(precision, bs, tag, **kw):
            if only is not None and tag not in only:
                return
            try:
                time_epoch(precision, bs, tag, **kw)
            except Exception as e:  # noqa: BLE001 — levers are best-effort
                results[tag] = {"error": repr(e)[:300], "batch": bs,
                                "precision": precision, **kw}
                print(f"{tag} FAILED: {e!r}", flush=True)
            flush()

        try_epoch("f32", 8, "epoch_f32_b8_paddedgrid", per_graph_grid=False)
        try_epoch("bf16", 8, "epoch_bf16_b8")
        try_epoch("f32", 16, "epoch_f32_b16")
        # chunk geometry: does doubling K at the same R cut per-chunk fixed
        # costs? MEASURED NO (RESULTS.md round 4): at enron's ~11 edges/row a
        # 128-row chunk holds ~1.4k edges, so K=2048 chunks go R-limited and
        # pad to ~30% dead edges — K=512 stays the default
        try_epoch("f32", 8, "epoch_f32_b8_k1024", k_edges=1024, r_rows=128)
        try_epoch("f32", 8, "epoch_f32_b8_k2048", k_edges=2048, r_rows=128)
        # train-side node view (round-4 lever, default-on in the auto path):
        # the train epoch runs at the largest TRAIN graph's bucket width
        # (wiki-vote 7,066 -> 7,168) instead of the eval graph's n_max
        # (33,696) — same math, ~4.7x less n-proportional HBM traffic
        try_epoch("f32", 8, "epoch_f32_b8_nodeview", train_node_view=True)
        # riskiest epoch lever LAST (OOMed once already at this scale)
        try_epoch("f32", 24, "epoch_f32_b24")

    if eval_only or only is None or "eval" in only:
        # eval share (runs every epoch in fit): 60 val trials on the unseen graph
        val_bi, val_bw = epoch_batches_grouped(va, data.graph_idx, 60, None)
        try:
            evaluate = make_eval_fn(model, eval_adj_fn, node_mask_fn)
            float(evaluate(params, d, val_bi, val_bw))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(evaluate(params, d, val_bi, val_bw))
                best = min(best, time.perf_counter() - t0)
            results["eval_pass_s"] = best
            print(f"eval pass (60 unseen-graph trials, 1 batch): {best:.3f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results["eval_pass_s"] = {"error": repr(e)[:300]}
            print(f"eval pass FAILED: {e!r}", flush=True)
        flush()
        print(f"wrote {out_path}", flush=True)

        # RISKY lever LAST (main results are already on disk): double the
        # kernel's fold budget so the 60-trial eval folds to g=16 (4 kernel
        # passes per f-eval instead of 8; ~17 MB VMEM out block — the
        # vmem_limit formula in _spmm2_call requests 2.2x output + margin, but
        # this footprint is UNTESTED on hardware and a Mosaic fault can wedge
        # the tunnel ~15 min, so it must not gate anything above).
        from gn_ode_sir_tpu.ops import pallas_spmm2 as p2

        saved_budgets = (p2.Pallas2Adj._OUT_VMEM_BUDGET,
                         p2.Pallas2SwitchAdj._OUT_VMEM_BUDGET)
        try:
            p2.Pallas2Adj._OUT_VMEM_BUDGET = 18 << 20
            p2.Pallas2SwitchAdj._OUT_VMEM_BUDGET = 18 << 20
            evaluate16 = make_eval_fn(model, eval_adj_fn, node_mask_fn)
            float(evaluate16(params, d, val_bi, val_bw))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(evaluate16(params, d, val_bi, val_bw))
                best = min(best, time.perf_counter() - t0)
            # record the fold group ACHIEVED (it is an implicit function of
            # n_pad and the patched budget — if geometry changes push it back
            # to the baseline g, this A/B silently compares identical programs)
            bval = int(val_bi.shape[1])
            g16 = min(bval,
                      p2._fold_group_limit(batch.n_max, 128, 18 << 20) // HIDDEN)
            g_base = min(bval, p2._fold_group_limit(batch.n_max, 128,
                                                    saved_budgets[0]) // HIDDEN)
            results["eval_pass_fold16_s"] = best
            results["eval_fold_groups"] = {"base": g_base, "lever": g16}
            print(f"eval pass at 2x fold budget (g={g16} vs base {g_base}): "
                  f"{best:.3f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — lever is best-effort
            results["eval_pass_fold16_s"] = None
            print(f"fold16 eval lever failed: {e!r}", flush=True)
        finally:
            # anything appended after this block must run at the tested budget
            p2.Pallas2Adj._OUT_VMEM_BUDGET = saved_budgets[0]
            p2.Pallas2SwitchAdj._OUT_VMEM_BUDGET = saved_budgets[1]
        flush()


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv, eval_only="--eval-only" in sys.argv)
