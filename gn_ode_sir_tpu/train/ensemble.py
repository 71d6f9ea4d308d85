"""Vmapped ensemble training: the K-repeat protocol as ONE compiled program.

The reference runs experiment repeats as sequential subprocesses — the
monitorer's ``hidden_dim_array=[8,8,8,8]`` spawns four identical-config
workers that differ only in (unseeded) model init (``monitorer-ngraphs.py:20``,
``monitorer-sim.py:192-196``). Under XLA that costs K compiles and K× wall
even though the K programs are byte-identical HLO over tiny matmuls that
underfill the MXU. The TPU-native answer is to make the repeat axis a tensor
axis: stack the K members' params and ``vmap`` the SAME whole-epoch body the
single-run :func:`~gn_ode_sir_tpu.train.loop.fit` jits — one compile, one
dispatch per epoch, K× the arithmetic intensity per kernel.

Each member keeps its own batch shuffles and train-time rng stream (seeded
exactly like K sequential ``fit(seed=seeds[j])`` calls), so the ensemble is
*semantically* K independent repeats — equality-tested member-by-member
against sequential ``fit`` (``tests/test_ensemble.py``).

Scaling out: pass ``mesh``/``mesh_axis`` to shard the member axis over
devices — repeats are embarrassingly parallel, so XLA partitions the program
with zero collectives in the step (the data is replicated, the members never
communicate). This is the framework's use for the mesh axis the parity map
leaves open (SURVEY.md §2.2: no TP exists to need it).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.train.data import TrialData, epoch_batches, epoch_batches_grouped
from gn_ode_sir_tpu.train.loop import (
    _data_to_device,
    eval_body,
    eval_per_trial_body,
    train_epoch_body,
)

__all__ = ["EnsembleFitResult", "fit_ensemble", "init_ensemble"]


def init_ensemble(model, seeds: Sequence[int]):
    """K-stacked params pytree: member j initialized from ``PRNGKey(seeds[j])``.

    Host-side stack of per-member inits (``model.init`` may do host work, so
    it is not assumed vmappable).
    """
    members = [model.init(jax.random.PRNGKey(int(s))) for s in seeds]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)


@dataclasses.dataclass
class EnsembleFitResult:
    params: Any  # K-stacked pytree
    opt_state: Any
    best_epoch: np.ndarray  # [K] int
    best_val_loss: np.ndarray  # [K]
    test_loss: np.ndarray  # [K]
    test_time: float  # wall of the last vmapped test eval (all K members)
    history: list  # (epoch, train_loss[K], val_loss[K])
    epoch_times: list
    test_loss_all: Any = None  # [K, n_test] per-trial losses at each member's best epoch
    best_params: Any = None  # K-stacked pytree at each member's best-val epoch


def _member_sharding(mesh, axis):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


def _replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def fit_ensemble(
    model,
    optimizer,
    params_stack,
    data: TrialData,
    train_idx,
    val_idx,
    test_idx,
    adj_fn,
    *,
    seeds: Sequence[int],
    epochs: int = 500,
    batch_size: int = 1,
    node_mask_fn=None,
    adj_aux=None,
    eval_adj_fn=None,
    batch_by_graph: bool = False,
    eval_batch_size: int | None = None,
    verbose: bool = True,
    log_every: int = 50,
    metrics_logger=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    checkpoint_auto_s: float = 0.0,
    resume: bool = False,
    track_test_per_trial: bool = False,
    mesh=None,
    mesh_axis: str = "ensemble",
    data_axis: str | None = None,
) -> EnsembleFitResult:
    """Train K members (one per entry of ``seeds``) in one compiled program.

    Mirrors :func:`~gn_ode_sir_tpu.train.loop.fit` semantics member-by-member
    (connectivity/adj_aux conventions, grouped batching, best-val-triggers-
    test protocol, periodic/auto checkpointing with exact-trace resume);
    member j's batch shuffles and train rng streams are seeded with
    ``seeds[j]`` exactly as ``fit(seed=seeds[j])`` would, and
    ``track_test_per_trial`` keeps the per-member [n_test] loss vector the
    OOD CSVs need (``ode_nn_ngraph_sim.py:483``). Not supported in ensemble
    mode: profiling — run that via sequential ``fit``.

    With ``mesh``, the member axis is sharded over ``mesh_axis`` (K must be a
    multiple of that axis size); everything else is replicated. Repeats never
    communicate, so the partitioned step contains no collectives. With
    ``data_axis`` (a second mesh axis) the trial-leading data arrays
    additionally shard their row axis over it — the 2-D (ensemble x data)
    composition: member compute partitions over ``mesh_axis`` while the
    trial store partitions over ``data_axis``, and XLA GSPMD inserts the
    gather collectives that fetch each member's minibatch rows. Numerics
    are unchanged (placement only).
    """
    if data_axis is not None:
        # validate up front: silently running unsharded (or colliding with
        # the member axis) would defeat the requested 2-D placement
        if mesh is None:
            raise ValueError(
                "data_axis requires a mesh — without one the trial store "
                "cannot shard; drop data_axis or pass mesh=")
        if data_axis == mesh_axis or data_axis not in mesh.axis_names:
            raise ValueError(
                f"data_axis {data_axis!r} must name a mesh axis distinct "
                f"from mesh_axis {mesh_axis!r} (mesh has {mesh.axis_names})")
    K = len(seeds)
    lead = jax.tree_util.tree_leaves(params_stack)[0].shape[0]
    if lead != K:
        raise ValueError(
            f"params_stack leading axis {lead} != len(seeds) {K} — build it "
            "with init_ensemble(model, seeds)"
        )
    for f in (adj_fn, eval_adj_fn):
        if (f is not None and getattr(f, "requires_grouped_batches", False)
                and not batch_by_graph):
            raise ValueError(
                f"{getattr(f, '__name__', 'adj_fn')} applies one graph's "
                "plan to the whole minibatch: it requires graph-homogeneous "
                "batches — call fit_ensemble(..., batch_by_graph=True)"
            )

    # node-view adjacencies only cover the graphs they were built for (same
    # guard as fit())
    def _check_view(f, idx, which, hint):
        ok_graphs = getattr(f, "valid_train_graphs", None)
        if ok_graphs is None or len(idx) == 0:
            return
        bad = set(int(g) for g in np.asarray(data.graph_idx)[
            np.asarray(idx, np.int64)]) - set(ok_graphs)
        if bad:
            raise ValueError(
                f"{which} contains trials of graphs {sorted(bad)}, but the "
                f"adjacency's node view only covers graphs "
                f"{sorted(ok_graphs)} (the non-eval bucket). {hint}"
            )

    _check_view(adj_fn, train_idx, "train_idx",
                "Pass the protocol train split, or rebuild connectivity "
                "with train_node_view=False.")
    for _idx, _name in ((val_idx, "val_idx"), (test_idx, "test_idx")):
        _check_view(eval_adj_fn or adj_fn, _idx, _name,
                    "Pass eval_adj_fn (the full-width adjacency), or rebuild "
                    "connectivity with train_node_view=False.")

    d = _data_to_device(data)
    if adj_aux is not None:
        d["__adj_aux__"] = jax.tree_util.tree_map(jnp.asarray, adj_aux)

    opt_state = jax.vmap(optimizer.init)(params_stack)

    n_view = getattr(adj_fn, "n_view", None)
    e_adj_fn = eval_adj_fn or adj_fn
    e_n_view = getattr(e_adj_fn, "n_view", None)
    # Member-axis routing. Default: one member's program vmapped over the
    # stacked axis (d and the eval batch rows shared via in_axes=None — XLA
    # broadcasts the gather). EXCEPT for the Pallas plan-stack multigraph
    # backend: vmap's batching rule pushes the member axis into the kernel's
    # VMEM block, which blows the scoped-VMEM limit at enron-scale eval
    # width (measured: K=2 block 33.6 MB > 23.3 MB) and runs the train
    # epoch ~4x slower per member at the train width; the kernel grid is
    # sequential on a TensorCore anyway, so those backends run members with
    # lax.map inside ONE jitted program — identical per-member HLO, same
    # device work, keeping the ensemble's one-compile/one-process win.
    # GN_ENS_SCAN=0/1 overrides; a sharded mesh forces vmap (the member
    # axis must stay a real array axis to partition).
    import os

    plan_stacked = bool(
        getattr(adj_fn, "requires_grouped_batches", False)
        or getattr(e_adj_fn, "requires_grouped_batches", False))
    _scan_env = os.environ.get("GN_ENS_SCAN")
    if _scan_env is not None:
        member_scan = _scan_env.strip().lower() not in ("0", "false", "no", "off")
    else:
        member_scan = plan_stacked
    if mesh is not None and plan_stacked and _scan_env is None:
        # vmapping pallas_call puts the member axis in the kernel's VMEM
        # block (scoped-VMEM compile failure at enron width), and lax.map
        # can't shard the member axis — fail loudly instead of compiling
        # a program the comment above documents as broken at scale.
        raise ValueError(
            "mesh-sharded ensembles vmap the member axis, which is "
            "incompatible with Pallas plan-stack connectivity at scale "
            "(the member axis lands in the kernel's VMEM block). Run "
            "unsharded (members lax.map inside one program), or force "
            "the vmap path explicitly with GN_ENS_SCAN=0 on a config "
            "small enough to fit."
        )
    if mesh is not None and member_scan and _scan_env is not None:
        # an EXPLICIT GN_ENS_SCAN=1 request cannot be honored under a
        # mesh (lax.map can't shard the member axis) — refuse rather than
        # silently inverting to the vmap routing the user opted out of
        raise ValueError(
            "GN_ENS_SCAN=1 (lax.map members) cannot be combined with a "
            "mesh: the member axis must stay a real array axis to "
            "partition. Drop the mesh for bit-exact lax.map members, or "
            "unset GN_ENS_SCAN to accept the vmap routing."
        )
    member_scan = member_scan and mesh is None

    _tr = train_epoch_body(model, optimizer, adj_fn, node_mask_fn,
                           n_view=n_view)
    _ev = eval_body(model, e_adj_fn, node_mask_fn, n_view=e_n_view)
    _evt = (eval_per_trial_body(model, e_adj_fn, node_mask_fn, n_view=e_n_view)
            if track_test_per_trial else None)
    evaluate_per_trial = None
    if member_scan:
        def _train_scan(ps, os_, d, bik, bwk, keys):
            return jax.lax.map(
                lambda x: _tr(x[0], x[1], d, x[2], x[3], x[4]),
                (ps, os_, bik, bwk, keys))

        train_epoch = jax.jit(_train_scan)
        evaluate = jax.jit(lambda ps, d, bi, bw: jax.lax.map(
            lambda p: _ev(p, d, bi, bw), ps))
        if _evt is not None:
            evaluate_per_trial = jax.jit(lambda ps, d, idx: jax.lax.map(
                lambda p: _evt(p, d, idx), ps))
    else:
        train_epoch = jax.jit(jax.vmap(_tr, in_axes=(0, 0, None, 0, 0, 0)))
        evaluate = jax.jit(jax.vmap(_ev, in_axes=(0, None, None, None)))
        if _evt is not None:
            evaluate_per_trial = jax.jit(jax.vmap(_evt, in_axes=(0, None, None)))

    if mesh is not None:
        size = dict(zip(mesh.axis_names, mesh.devices.shape))[mesh_axis]
        if K % size != 0:
            raise ValueError(
                f"ensemble size {K} not divisible by mesh axis "
                f"'{mesh_axis}' of size {size}"
            )
        member_s = _member_sharding(mesh, mesh_axis)
        repl = _replicated(mesh)
        params_stack = jax.device_put(params_stack, member_s)
        opt_state = jax.device_put(opt_state, member_s)
        if data_axis is not None:
            # 2-D (ensemble x data): trial rows shard over data_axis;
            # connectivity aux stays replicated (every member needs the
            # whole graph every step)
            row_s = _member_sharding(mesh, data_axis)
            d = {k: jax.device_put(v, repl if k == "__adj_aux__" else row_s)
                 for k, v in d.items()}
        else:
            d = jax.device_put(d, repl)

    def _put_member(x):
        return jax.device_put(x, member_s) if mesh is not None else x

    ebs = eval_batch_size or max(batch_size, 8)
    # per-member batch shuffle streams, seeded like sequential fit(seed=s)
    rngs = [np.random.default_rng(int(s)) for s in seeds]
    if batch_by_graph:
        val_bi, val_bw = epoch_batches_grouped(val_idx, data.graph_idx, ebs, None)
        test_bi, test_bw = epoch_batches_grouped(test_idx, data.graph_idx, ebs, None)
    else:
        val_bi, val_bw = epoch_batches(len(val_idx), ebs, None)
        test_bi, test_bw = epoch_batches(len(test_idx), ebs, None)
        val_bi = np.asarray(val_idx, np.int32)[val_bi]
        test_bi = np.asarray(test_idx, np.int32)[test_bi]

    def _epoch_batches_stacked():
        bis, bws = [], []
        for rng in rngs:
            if batch_by_graph:
                bi, bw = epoch_batches_grouped(
                    train_idx, data.graph_idx, batch_size, rng)
            else:
                bi, bw = epoch_batches(len(train_idx), batch_size, rng)
                bi = np.asarray(train_idx, np.int32)[bi]
            bis.append(bi)
            bws.append(bw)
        return np.stack(bis), np.stack(bws)

    base_keys = jnp.stack([jax.random.PRNGKey(int(s) + 1) for s in seeds])

    best_val = np.full(K, np.inf)
    best_epoch = np.full(K, -1, np.int64)
    best_params_stack = params_stack  # per-member snapshot at each member's
    # best-val epoch (leaves selected member-wise on improvement)
    test_loss = np.full(K, np.nan)
    test_loss_all = None  # [K, n_test] once tracked
    test_idx_arr = np.asarray(test_idx, np.int32)
    test_time = 0.0
    history, epoch_times = [], []
    start_epoch = 0

    ckpt_on_disk = False
    if checkpoint_dir and resume:
        import os

        from gn_ode_sir_tpu.train.checkpoint import restore_with_layout_ladder

        if os.path.isdir(os.path.join(checkpoint_dir, "state")):
            ckpt_on_disk = True
            target = {
                "params": params_stack, "opt_state": opt_state, "epoch": 0,
                "best_val": best_val, "best_epoch": best_epoch,
                "test_loss": test_loss,
            }
            # same persistence rules and shared layout ladder as fit():
            # optional key-groups newest first — "test_time", the
            # per-member "best_params" serving snapshot and, on OOD runs,
            # the per-trial "test_loss_all" vector
            groups = [{"test_time": 0.0}, {"best_params": params_stack}]
            if track_test_per_trial:
                groups.append({"test_loss_all": np.zeros((K, len(test_idx)))})
            st = restore_with_layout_ladder(checkpoint_dir, target, groups)
            if track_test_per_trial and "test_loss_all" in st:
                test_loss_all = np.asarray(st["test_loss_all"])
            params_stack = _put_member(st["params"])
            opt_state = _put_member(st["opt_state"])
            best_params_stack = st.get("best_params", st["params"])
            start_epoch = int(st["epoch"]) + 1
            best_val = np.asarray(st["best_val"])
            best_epoch = np.asarray(st["best_epoch"], np.int64)
            test_loss = np.asarray(st["test_loss"])
            test_time = float(st.get("test_time", 0.0))
            # fast-forward every member's shuffle stream so epoch k of the
            # resumed run draws the SAME permutations (exact-trace resume,
            # as in fit())
            for _ in range(start_epoch):
                _epoch_batches_stacked()
            if verbose:
                print(f"resumed ensemble from {checkpoint_dir} at epoch "
                      f"{start_epoch}")

    def _save(epoch):
        nonlocal ckpt_on_disk
        ckpt_on_disk = True
        from gn_ode_sir_tpu.train.checkpoint import save_checkpoint

        state = {
            "params": params_stack, "opt_state": opt_state, "epoch": epoch,
            "best_val": best_val, "best_epoch": best_epoch,
            "test_loss": test_loss, "best_params": best_params_stack,
            "test_time": float(test_time),
        }
        if track_test_per_trial:
            state["test_loss_all"] = (
                np.full((K, len(test_idx)), np.nan)
                if test_loss_all is None else np.asarray(test_loss_all)
            )
        save_checkpoint(checkpoint_dir, state)

    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        bi, bw = _epoch_batches_stacked()
        epoch_keys = jax.vmap(jax.random.fold_in, (0, None))(base_keys, epoch)
        params_stack, opt_state, train_l = train_epoch(
            params_stack, opt_state, d, _put_member(jnp.asarray(bi)),
            _put_member(jnp.asarray(bw)), _put_member(epoch_keys))
        val_l = np.asarray(evaluate(params_stack, d, val_bi, val_bw))
        epoch_times.append(time.perf_counter() - t0)
        train_l = np.asarray(train_l)
        history.append((epoch, train_l, val_l))
        if metrics_logger is not None:
            metrics_logger.log(
                epoch=epoch, train_loss=float(train_l.mean()),
                val_loss=float(val_l.mean()), epoch_s=epoch_times[-1],
            )

        improved = val_l < best_val
        if improved.any():
            best_val = np.where(improved, val_l, best_val)
            best_epoch = np.where(improved, epoch, best_epoch)
            imp = jnp.asarray(improved)
            best_params_stack = jax.tree_util.tree_map(
                lambda b, p: jnp.where(
                    imp.reshape((K,) + (1,) * (p.ndim - 1)), p, b),
                best_params_stack, params_stack)
            t1 = time.perf_counter()
            test_all = np.asarray(evaluate(params_stack, d, test_bi, test_bw))
            test_time = time.perf_counter() - t1
            test_loss = np.where(improved, test_all, test_loss)
            if evaluate_per_trial is not None:
                per_trial = np.asarray(
                    evaluate_per_trial(params_stack, d, test_idx_arr))
                if test_loss_all is None:
                    test_loss_all = np.full((K, len(test_idx)), np.nan)
                test_loss_all = np.where(
                    improved[:, None], per_trial, test_loss_all)
        if verbose and (epoch % log_every == 0 or epoch == epochs - 1):
            tr_s = "/".join(f"{x:.6f}" for x in train_l)
            va_s = "/".join(f"{x:.6f}" for x in val_l)
            print(f"Epoch: {epoch:03d}, Train Loss: {tr_s}, "
                  f"Val Loss: {va_s} ({epoch_times[-1]:.3f}s)")
        if (checkpoint_dir and checkpoint_auto_s and not checkpoint_every
                and epoch == start_epoch + 2):
            steady_s = float(np.min(epoch_times[-3:]))
            projected = (float(np.sum(epoch_times))
                         + steady_s * (epochs - epoch - 1))
            if projected > checkpoint_auto_s:
                checkpoint_every = max(1, int(300.0 / steady_s))
                if verbose:
                    print(f"auto-checkpoint: projected {projected/60:.1f} min "
                          f"run -> saving every {checkpoint_every} epochs")
        if checkpoint_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            _save(epoch)

    if (checkpoint_dir and epochs > start_epoch
            and (checkpoint_every or ckpt_on_disk or not checkpoint_auto_s)):
        _save(epochs - 1)
    return EnsembleFitResult(
        params=params_stack,
        opt_state=opt_state,
        best_epoch=best_epoch,
        best_val_loss=best_val,
        test_loss=test_loss,
        test_time=test_time,
        history=history,
        epoch_times=epoch_times,
        test_loss_all=test_loss_all,
        best_params=best_params_stack,
    )
