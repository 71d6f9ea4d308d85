"""Serving entry point: score what-if scenarios with a trained checkpoint.

The reference has NO inference-only path — a trained model lives and dies
inside one worker process (SURVEY.md §5: no ``torch.save`` anywhere), so
"what does my trained GN-ODE predict for a new outbreak seed / new (β, γ)?"
requires retraining from scratch there. This is the production-serving
counterpart the TPU framework adds on top of Orbax checkpointing:

  python -m gn_ode_sir_tpu.cli.infer \
      --ckpt <orbax dir written by worker --save_checkpoint> \
      --dataset ./real_graphs/karate --model ode_nn --hidden 64 \
      --I_indices "[2, 5]" "[7]" --beta 0.3 0.2 --gamma 0.1 0.4 \
      --out predictions.npz

Every scenario (seed-set, β, γ) is one row of a single batched
``model.predict`` dispatch — the whole what-if sweep is ONE jitted program.
With ``--spmd`` the batch shards over all local devices through
``parallel.spmd.make_spmd_predict_fn`` (params replicated, trials split,
no collectives — the per-scenario summary reduction of ``--summary_only``
runs inside each shard), which is how a multi-chip deployment scores
large scenario matrices.

Model/adjacency construction is shared with the training worker
(``worker.build_model_and_adj``), so a checkpoint is always scored through
the exact architecture and message-passing backend it was trained with.
Architecture hyperparameters (``--hidden --method --deltaT --maxTime``...)
must match the training run; restored params are validated against the
declared architecture's pytree (structure + leaf shapes) before serving,
so a wrong ``--hidden``/``--model`` — or pointing ``--ckpt`` at a
K-stacked ``-ensK`` ensemble directory — fails with a clear message
instead of serving a silently different model.
"""

from __future__ import annotations

import argparse
import functools
import json
import os

import numpy as np

from gn_ode_sir_tpu.cli.worker import (
    build_model_and_adj,
    build_parser as _worker_parser,
    parse_i_indices,
)


def build_parser() -> argparse.ArgumentParser:
    wp = _worker_parser()  # single source of truth for shared defaults
    w = wp.get_default
    p = argparse.ArgumentParser(
        description="Score (seed-set, beta, gamma) scenarios with a trained "
                    "checkpoint — the inference/serving entry point")
    p.add_argument("--ckpt", required=True,
                   help="Orbax checkpoint dir (worker --save_checkpoint or a "
                        "periodic --checkpoint_every/--auto_checkpoint dir)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--model", default=w("model"),
                   choices=["ode_nn", "GCN", "GIN"])
    # architecture knobs — MUST match the training run
    p.add_argument("--hidden", type=int, default=w("hidden"))
    p.add_argument("--method", default=w("method"))
    p.add_argument("--deltaT", type=float, default=w("deltaT"))
    p.add_argument("--maxTime", type=int, default=w("maxTime"))
    p.add_argument("--adjoint", default=w("adjoint"))
    p.add_argument("--solver_unroll", type=int, default=w("solver_unroll"))
    p.add_argument("--gnode_dtype", default=w("gnode_dtype"),
                   choices=["f32", "bf16"])
    p.add_argument("--spmm", default=w("spmm"),
                   choices=["auto", "dense", "dense-bf16", "coo", "ell",
                            "pallas2", "pallas2-bf16"])
    # scenarios: inline flags (reference --I_indices/--beta/--gamma shapes)
    # or a JSON file with [{"seeds": [..], "beta": b, "gamma": g}, ...]
    p.add_argument("--I_indices", nargs="+", default=None,
                   help="one seed-set per scenario, reference list-string or "
                        "comma form ('[2, 5]' or 2,5)")
    p.add_argument("--beta", type=float, nargs="+", default=None)
    p.add_argument("--gamma", type=float, nargs="+", default=None)
    p.add_argument("--scenarios", default=None,
                   help="JSON file: [{'seeds': [...], 'beta': f, 'gamma': f}]")
    p.add_argument("--out", default="predictions.npz",
                   help=".npz output: S/I/R [B, T, n] + scenario arrays")
    p.add_argument("--summary_csv", default=None,
                   help="optional per-scenario summary CSV (peak infection "
                        "time/size, final recovered fraction)")
    p.add_argument("--spmd", action="store_true",
                   help="shard the scenario batch over all local devices "
                        "(batch padded to a device multiple by repeating "
                        "the last scenario; padding rows are sliced off "
                        "the output). Composes with --summary_only: each "
                        "device reduces its own shard")
    p.add_argument("--dispatch_batch", type=int, default=None,
                   help="cap scenarios per device dispatch (large-graph "
                        "HBM ceiling — enron costs ~132 MB activations/"
                        "scenario); chunks reuse one compiled executable, "
                        "tail chunk padded+sliced")
    p.add_argument("--summary_only", action="store_true",
                   help="reduce trajectories to per-scenario summaries ON "
                        "DEVICE and skip the .npz — at large-graph scale "
                        "the full-trajectory host readback dominates the "
                        "serving wall")
    return p


def load_scenarios(args) -> tuple[list[list[int]], np.ndarray, np.ndarray]:
    if args.scenarios is not None:
        with open(args.scenarios) as f:
            rows = json.load(f)
        seeds = [list(map(int, r["seeds"])) for r in rows]
        beta = np.asarray([float(r["beta"]) for r in rows], np.float32)
        gamma = np.asarray([float(r["gamma"]) for r in rows], np.float32)
        return seeds, beta, gamma
    if args.I_indices is None:
        raise SystemExit("provide --I_indices/--beta/--gamma or --scenarios")
    seeds = parse_i_indices(args.I_indices)
    beta = np.asarray(args.beta if args.beta is not None
                      else [0.2] * len(seeds), np.float32)
    gamma = np.asarray(args.gamma if args.gamma is not None
                       else [0.1] * len(seeds), np.float32)
    if not (len(seeds) == len(beta) == len(gamma)):
        raise SystemExit(
            f"scenario arrays must align: {len(seeds)} seed sets, "
            f"{len(beta)} beta, {len(gamma)} gamma")
    return seeds, beta, gamma


def restore_params(ckpt: str):
    """Params pytree from any checkpoint layout, best-val weights preferred.

    Layouts, newest first: ``<ckpt>/serve`` (the worker's
    ``--save_checkpoint`` best-params save), ``<ckpt>/state`` (a periodic
    fit() state — its ``best_params`` entry when present, else the
    final-epoch ``params`` of older checkpoints). Raw (target-free)
    restore: params feed jit as host arrays, no optimizer structure needed.
    """
    from gn_ode_sir_tpu.train.checkpoint import restore_checkpoint

    for name in ("serve", "state"):
        if os.path.isdir(os.path.join(ckpt, name)):
            state = restore_checkpoint(ckpt, name=name)
            if isinstance(state, dict):
                if state.get("best_params") is not None:
                    return state["best_params"]
                if "params" in state:
                    return state["params"]
            return state  # a bare params pytree
    raise SystemExit(
        f"no checkpoint found under {ckpt} (expected a 'serve' or 'state' "
        "subdirectory written by the worker)")


def check_params_match(model, params) -> None:
    """Fail loudly when restored params don't fit the declared architecture
    (wrong --hidden/--model, or a K-stacked -ensK ensemble checkpoint)."""
    import jax

    # a real (tiny) init, not eval_shape: init() may do host-side work
    expect = model.init(jax.random.PRNGKey(0))
    exp_t = jax.tree_util.tree_structure(expect)
    got_t = jax.tree_util.tree_structure(params)
    exp_s = [tuple(l.shape) for l in jax.tree_util.tree_leaves(expect)]
    got_s = [tuple(np.shape(l)) for l in jax.tree_util.tree_leaves(params)]
    if exp_t != got_t or exp_s != got_s:
        raise SystemExit(
            "checkpoint params do not match the declared architecture "
            f"(check --model/--hidden, and that --ckpt is not a K-stacked "
            f"-ensK ensemble directory): expected leaves {exp_s}, "
            f"checkpoint has {got_s}")


def scenario_batch(n_nodes: int, seeds, beta, gamma):
    """[B, n] initial indicator rows + [B] params, the model input contract
    (s0/i0/r0 exactly as the training data builder lays them out)."""
    b = len(seeds)
    i0 = np.zeros((b, n_nodes), np.float32)
    for j, s in enumerate(seeds):
        i0[j, np.asarray(s, np.int64)] = 1.0
    s0 = 1.0 - i0
    r0 = np.zeros_like(i0)
    return s0, i0, r0, np.asarray(beta, np.float32), np.asarray(gamma, np.float32)


_SPMD_CACHE: dict = {}


def _summary_reduce(probs, mask=None):
    """Per-scenario epidemic summary [T, B, n, 3] -> [B, 3]: peak infected
    fraction, peak time, final recovered fraction (the device-side twin of
    :func:`summarize`). Per-scenario, so it shards without a collective.

    ``mask`` ([B, n], 1 on real nodes) makes the node means fraction-exact
    on padded multigraph batches: without it a graph padded from n_g to
    n_max reads fractions scaled by n_g/n_max (zeroed padding rows would
    be averaged in)."""
    import jax.numpy as jnp

    if mask is None:
        i_t = probs[..., 1].mean(axis=2)  # [T, B]
        final_r = probs[-1, :, :, 2].mean(axis=1)
    else:
        denom = jnp.maximum(mask.sum(axis=1), 1.0)  # [B]
        i_t = (probs[..., 1] * mask[None]).sum(axis=2) / denom[None]
        final_r = (probs[-1, :, :, 2] * mask).sum(axis=1) / denom
    return jnp.stack(
        [i_t.max(axis=0), jnp.argmax(i_t, axis=0).astype(jnp.float32),
         final_r], axis=1)


def _spmd_dispatch(model, params, adj, s0, i0, r0, beta, gamma, *,
                   summary: bool):
    """Shard the scenario batch over all local devices and run one sharded
    program (full trajectories, or the on-device summary reduction when
    ``summary``). The batch is padded to a device multiple by repeating the
    last scenario — a guaranteed-valid model input — and the padding rows
    are sliced back off the output."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gn_ode_sir_tpu.parallel.spmd import make_spmd_predict_fn

    b = s0.shape[0]
    ndev = jax.device_count()
    pad = (-b) % ndev
    if pad:
        rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
        s0, i0, r0, beta, gamma = map(rep, (s0, i0, r0, beta, gamma))
    # memoized like _predict_jit: repeat serving calls must reuse the
    # sharded executable, not rebuild mesh + shard_map every time
    key = (model, ndev, jax.tree_util.tree_structure(adj), summary)
    fn = _SPMD_CACHE.get(key)
    if fn is None:
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        fn = make_spmd_predict_fn(
            model, lambda gi, aux: aux["adj"], mesh,
            aux_example={"adj": adj},
            reduce_fn=_summary_reduce if summary else None)
        _SPMD_CACHE[key] = fn
    # restored params sit committed on device 0; hand the mesh program
    # host arrays so pjit replicates them instead of erroring on the
    # single-device placement. Skip when the caller already hoisted the
    # transfer (the chunked paths convert ONCE for the whole sweep — a
    # per-chunk device→host round trip through the tunnel costs 5-200+ ms
    # each).
    if not all(isinstance(l, np.ndarray)
               for l in jax.tree_util.tree_leaves(params)):
        params = jax.tree_util.tree_map(np.asarray, params)
    batch = {
        "s0": jnp.asarray(s0), "i0": jnp.asarray(i0), "r0": jnp.asarray(r0),
        "beta": jnp.asarray(beta), "gamma": jnp.asarray(gamma),
        "graph_idx": jnp.zeros(s0.shape[0], jnp.int32),
    }
    out = np.asarray(fn(params, batch, {"adj": adj}))
    return out[:b] if summary else out[:, :b]


def _chunked(call, arrays, dispatch_batch, batch_axis):
    """Run ``call(*chunk)`` over fixed-size chunks of the scenario arrays
    and concatenate on ``batch_axis``. The tail chunk is padded by
    repeating its last scenario (a guaranteed-valid model input) so every
    dispatch reuses ONE compiled executable; padding rows are sliced off.
    """
    b = arrays[0].shape[0]
    if dispatch_batch < 1:
        raise ValueError("dispatch_batch must be a positive integer")
    outs = []
    for lo in range(0, b, dispatch_batch):
        hi = min(lo + dispatch_batch, b)
        chunk = [a[lo:hi] for a in arrays]
        pad = dispatch_batch - (hi - lo)
        if pad:
            chunk = [np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
                     for a in chunk]
        out = call(*chunk)
        sl = [slice(None)] * out.ndim
        sl[batch_axis] = slice(0, hi - lo)
        outs.append(out[tuple(sl)])
    return np.concatenate(outs, axis=batch_axis)


def predict_scenarios(model, params, adj, s0, i0, r0, beta, gamma, *,
                      spmd=False, dispatch_batch=None):
    """[T, B, n, 3] probabilities; one jitted dispatch (optionally SPMD).

    ``dispatch_batch`` caps scenarios per device dispatch, as in
    :func:`predict_summaries` — it bounds device activation memory and
    per-dispatch wall (a >1 min single execution dies through a tunneled
    device); the full trajectories still accumulate on the HOST, which is
    the caller's choice by using the full-trajectory path."""
    import jax
    import jax.numpy as jnp

    b = s0.shape[0]
    if dispatch_batch and b > dispatch_batch:
        if spmd and jax.device_count() > 1:
            # hoist the params device→host pull out of the per-chunk path
            params = jax.tree_util.tree_map(np.asarray, params)
        return _chunked(
            lambda *c: predict_scenarios(model, params, adj, *c, spmd=spmd),
            (s0, i0, r0, beta, gamma), dispatch_batch, batch_axis=1)
    if spmd and jax.device_count() > 1:
        return _spmd_dispatch(model, params, adj, s0, i0, r0, beta, gamma,
                              summary=False)
    fn = _predict_jit(model)
    return np.asarray(fn(params, adj, jnp.asarray(s0), jnp.asarray(i0),
                         jnp.asarray(r0), jnp.asarray(beta), jnp.asarray(gamma)))


@functools.cache  # models are frozen dataclasses — hashable jit-cache keys.
def _predict_jit(model):
    # One wrapper per model so repeated serving calls reuse the compiled
    # executable (a fresh jit(lambda) per call would re-trace every time).
    import jax

    return jax.jit(lambda p, a, *xs: model.predict(p, a, *xs, train=False))


@functools.cache
def _summary_jit(model):
    import jax

    def fn(p, a, *xs):
        return _summary_reduce(model.predict(p, a, *xs, train=False))  # [B, 3]

    return jax.jit(fn)


def _summary_array(model, params, adj, s0, i0, r0, beta, gamma, *, spmd):
    """[B, 3] summary rows, one dispatch (sharded when ``spmd``)."""
    import jax
    import jax.numpy as jnp

    if spmd and jax.device_count() > 1:
        return _spmd_dispatch(model, params, adj, s0, i0, r0, beta, gamma,
                              summary=True)
    return np.asarray(_summary_jit(model)(
        params, adj, jnp.asarray(s0), jnp.asarray(i0), jnp.asarray(r0),
        jnp.asarray(beta), jnp.asarray(gamma)))


def predict_summaries(model, params, adj, s0, i0, r0, beta, gamma, *,
                      spmd=False, dispatch_batch=None):
    """Summary-only serving: the [T, B, n, 3] trajectory is reduced ON
    DEVICE to per-scenario scalars (peak infected fraction/time, final
    recovered fraction), so the host readback is [B, 3] instead of the
    full trajectory — at enron scale that readback dominates the serving
    wall through a network-attached device (measured 6.4 s full-trajectory
    vs ~1.9 s with the few-float readback; runs_r4/probe_serving.json).
    With ``spmd`` the scenario batch additionally shards over all local
    devices and each device reduces its own shard (no collective — the
    reduction is per-scenario).

    ``dispatch_batch`` caps scenarios per device dispatch: the forward
    trajectory costs ~T*B*n*3*h*4 bytes of activations, so one big batch
    OOMs HBM at large-graph scale (enron: ~132 MB/scenario) — chunking
    runs ceil(B/dispatch_batch) dispatches that all reuse ONE compiled
    executable (the tail chunk is padded by repeating its last scenario
    and sliced back off). Summaries are per-scenario, so chunking is
    exact. Returns the same rows as :func:`summarize`.
    """
    b = s0.shape[0]
    if dispatch_batch and b > dispatch_batch:
        if spmd:
            import jax

            if jax.device_count() > 1:
                # one params host pull for the whole sweep, not per chunk
                params = jax.tree_util.tree_map(np.asarray, params)
        out = _chunked(
            lambda *c: _summary_array(model, params, adj, *c, spmd=spmd),
            (s0, i0, r0, beta, gamma), dispatch_batch, batch_axis=0)
    else:
        out = _summary_array(model, params, adj, s0, i0, r0, beta, gamma,
                             spmd=spmd)
    return [{"scenario": j, "peak_infected_frac": float(out[j, 0]),
             "peak_time": int(out[j, 1]),
             "final_recovered_frac": float(out[j, 2])}
            for j in range(out.shape[0])]


def summarize(probs_btn3) -> list[dict]:
    """Per-scenario epidemic summary from [B, T, n, 3] trajectories."""
    rows = []
    for j in range(probs_btn3.shape[0]):
        i_t = probs_btn3[j, :, :, 1].mean(axis=1)  # expected infected frac
        rows.append({
            "scenario": j,
            "peak_infected_frac": float(i_t.max()),
            "peak_time": int(i_t.argmax()),
            "final_recovered_frac": float(probs_btn3[j, -1, :, 2].mean()),
        })
    return rows


def main(argv=None) -> int:
    from gn_ode_sir_tpu.cli import apply_data_root_default
    from gn_ode_sir_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    apply_data_root_default()
    enable_persistent_compilation_cache()
    args = build_parser().parse_args(argv)

    from gn_ode_sir_tpu.graphs import load_graph

    g = load_graph(args.dataset)
    seeds, beta, gamma = load_scenarios(args)
    if not seeds:
        raise SystemExit("no scenarios to score (empty --scenarios file?)")
    for j, s in enumerate(seeds):
        bad = [v for v in s if not 0 <= int(v) < g.n_nodes]
        if bad:
            raise SystemExit(
                f"scenario {j}: seed nodes {bad} out of range for "
                f"{g.name} (n_nodes={g.n_nodes})")
    if args.dispatch_batch is not None and args.dispatch_batch < 1:
        raise SystemExit("--dispatch_batch must be a positive integer")
    # the solver policy (adjoint/unroll, models/gnode.py::solver_policy)
    # must be sized for what one DISPATCH holds, not the whole sweep —
    # else a large chunked sweep needlessly degrades every chunk to the
    # checkpointed scan
    dispatch_b = min(len(seeds), args.dispatch_batch or len(seeds))
    model, adj = build_model_and_adj(args, g, batch_size=dispatch_b)
    params = restore_params(args.ckpt)
    check_params_match(model, params)
    s0, i0, r0, beta, gamma = scenario_batch(g.n_nodes, seeds, beta, gamma)
    if args.summary_only:
        rows = predict_summaries(model, params, adj, s0, i0, r0, beta, gamma,
                                 spmd=args.spmd,
                                 dispatch_batch=args.dispatch_batch)
    else:
        out = predict_scenarios(model, params, adj, s0, i0, r0, beta, gamma,
                                spmd=args.spmd,
                                dispatch_batch=args.dispatch_batch)  # [T, B, n, 3]
        probs = np.transpose(out, (1, 0, 2, 3))  # [B, T, n, 3]
        np.savez(
            args.out,
            S=probs[..., 0], I=probs[..., 1], R=probs[..., 2],
            beta=beta, gamma=gamma,
            seed_sets=np.asarray(
                [",".join(map(str, s)) for s in seeds], dtype=object),
        )
        rows = summarize(probs)
    if args.summary_csv:
        import csv

        with open(args.summary_csv, "w", newline="") as f:
            wtr = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            wtr.writeheader()
            wtr.writerows(rows)
    print(json.dumps({"scenarios": len(seeds),
                      "out": None if args.summary_only else args.out,
                      "summary": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
