"""Training loop: epoch-level ``lax.scan``, best-val-triggers-test protocol.

The reference trains with a Python DataLoader loop dispatching one tiny
kernel chain per sample (batch_size=1 at the monitorer defaults,
``monitorer-sim.py:10``) — on TPU that would be dispatch-bound. Here a whole
epoch is ONE compiled program: a scan over precomputed batch-index rows,
gathering each minibatch on device. The val pass is a second compiled scan;
the test pass runs only when validation improves, reproducing the
best-val-early-test protocol (``ode_nn_ngraph_sim.py:459-465``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gn_ode_sir_tpu.train.data import TrialData, epoch_batches, epoch_batches_grouped
from gn_ode_sir_tpu.train.loss import l1_sir_loss


def _data_to_device(data: TrialData) -> dict:
    return {
        "s0": jnp.asarray(data.s0),
        "i0": jnp.asarray(data.i0),
        "r0": jnp.asarray(data.r0),
        "beta": jnp.asarray(data.beta),
        "gamma": jnp.asarray(data.gamma),
        "labels": jnp.asarray(data.labels),
        "graph_idx": jnp.asarray(data.graph_idx),
    }


def _batch_loss(model, params, adj_fn, node_mask_fn, d, bidx, bw, rng=None,
                train=False, n_view=None):
    gi = d["graph_idx"][bidx]
    # adjacency/mask arrays ride inside `d` ("__adj_aux__") so they are jit
    # ARGUMENTS — a closure-captured device array would be baked into the
    # compiled program as a constant (huge HLO, slow/failing compiles).
    aux = d.get("__adj_aux__")
    adj = adj_fn(gi) if aux is None else adj_fn(gi, aux)
    if node_mask_fn is None:
        node_mask = None
    else:
        node_mask = node_mask_fn(gi) if aux is None else node_mask_fn(gi, aux)
        node_mask = node_mask[:, :n_view]
    # ``n_view`` slices the node axis down to this program's bucket width
    # (e.g. the largest TRAIN graph in a multigraph run whose unseen eval
    # graph sets a much larger global n_max). Rows >= n_view are all-padding
    # for every trial this program sees (mask-zeroed, label 0), so the math
    # is unchanged — only the n-proportional HBM traffic shrinks. XLA fuses
    # the slice into the ``[bidx]`` gather; with n_view=None it is a no-op.
    pred = model.predict(
        params,
        adj,
        d["s0"][bidx][:, :n_view],
        d["i0"][bidx][:, :n_view],
        d["r0"][bidx][:, :n_view],
        d["beta"][bidx],
        d["gamma"][bidx],
        rng=rng,
        train=train,
    )
    loss = l1_sir_loss(pred, d["labels"][bidx][:, :, :n_view], trial_weight=bw,
                       node_mask=node_mask)
    # item count for reference-style weighted aggregation (ode_nn_ngraph_sim.py:248)
    if node_mask is not None:
        n_eff = node_mask.sum(1)
    else:
        n_eff = n_view if n_view is not None else d["s0"].shape[1]
    items = 3.0 * (d["labels"].shape[1] - 1) * (bw * n_eff).sum()
    return loss, items


def train_epoch_body(model, optimizer, adj_fn, node_mask_fn=None,
                     n_view=None) -> Callable:
    """The un-jitted whole-epoch trainer body — scan over minibatch rows.

    Exposed separately from :func:`make_train_epoch_fn` so ensemble training
    can wrap it in ``vmap`` over a leading member axis before jitting
    (``train/ensemble.py``) while the single-run path jits it directly:
    both compile the SAME per-member program.
    """

    def train_epoch(params, opt_state, d, batch_idx, batch_w, rng_key):
        def step(carry, xs):
            params, opt_state = carry
            bidx, bw, k = xs
            rng = jax.random.fold_in(rng_key, k)

            def loss_fn(p):
                loss, items = _batch_loss(
                    model, p, adj_fn, node_mask_fn, d, bidx, bw, rng=rng,
                    train=True, n_view=n_view
                )
                return loss, items

            (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss * items, items)

        steps = jnp.arange(batch_idx.shape[0])
        (params, opt_state), (loss_sums, item_counts) = jax.lax.scan(
            step, (params, opt_state), (batch_idx, batch_w, steps)
        )
        return params, opt_state, loss_sums.sum() / item_counts.sum()

    return train_epoch


def make_train_epoch_fn(model, optimizer, adj_fn, node_mask_fn=None,
                        n_view=None) -> Callable:
    """One-jit whole-epoch trainer: scan over minibatch index rows.

    ``n_view`` (see :func:`_batch_loss`) runs the whole compiled epoch at a
    node-bucket width smaller than the data's global padding — the adjacency
    returned by ``adj_fn`` must be built for the same width. ``fit`` resolves
    it automatically from ``adj_fn.n_view`` when the connectivity provider
    declares one (``multigraph_pallas2_fns``).
    """
    return jax.jit(train_epoch_body(model, optimizer, adj_fn, node_mask_fn,
                                    n_view=n_view))


def eval_body(model, adj_fn, node_mask_fn=None, n_view=None) -> Callable:
    """Un-jitted evaluation scan body (see :func:`train_epoch_body`)."""

    def evaluate(params, d, batch_idx, batch_w):
        def step(_, xs):
            bidx, bw = xs
            loss, items = _batch_loss(model, params, adj_fn, node_mask_fn, d,
                                      bidx, bw, n_view=n_view)
            return 0, (loss * items, items)

        _, (loss_sums, item_counts) = jax.lax.scan(step, 0, (batch_idx, batch_w))
        return loss_sums.sum() / item_counts.sum()

    return evaluate


def make_eval_fn(model, adj_fn, node_mask_fn=None, n_view=None) -> Callable:
    """Batched evaluation scan returning the item-weighted mean L1."""
    return jax.jit(eval_body(model, adj_fn, node_mask_fn, n_view=n_view))


def eval_per_trial_body(model, adj_fn, node_mask_fn=None, n_view=None) -> Callable:
    """Un-jitted per-trial evaluation body (see :func:`make_eval_per_trial_fn`);
    the ensemble engine maps/vmaps it over the member axis."""

    def evaluate_per_trial(params, d, idx):
        def step(_, i):
            bidx = i[None]
            loss, _ = _batch_loss(
                model, params, adj_fn, node_mask_fn, d, bidx, jnp.ones((1,)),
                n_view=n_view
            )
            return 0, loss

        _, losses = jax.lax.scan(step, 0, jnp.asarray(idx, jnp.int32))
        return losses

    return evaluate_per_trial


def make_eval_per_trial_fn(model, adj_fn, node_mask_fn=None, n_view=None) -> Callable:
    """Per-trial evaluation: loss vector [len(idx)], one entry per trial.

    The reference's ``test`` collects a per-batch loss list ``test_loss_all``
    (``ode_nn_ngraph_sim.py:281-295``; batch_size=1 at the monitorer defaults
    makes it per-trial) which feeds the first out-of-dist CSV (``:483``).
    Here each trial is one scan step (a batch of one), so the vector is
    per-trial regardless of the training batch size.
    """
    return jax.jit(eval_per_trial_body(model, adj_fn, node_mask_fn, n_view=n_view))


@dataclasses.dataclass
class FitResult:
    params: Any
    opt_state: Any
    best_epoch: int
    best_val_loss: float
    test_loss: float
    test_time: float
    history: list  # (epoch, train_loss, val_loss)
    epoch_times: list
    test_loss_all: Any = None  # per-trial test losses at the best-val epoch
    best_params: Any = None  # params at the best-val epoch (the weights the
    # reported test_loss was scored with — the serving snapshot)


def fit(
    model,
    optimizer,
    params,
    data: TrialData,
    train_idx,
    val_idx,
    test_idx,
    adj_fn,
    *,
    epochs: int = 500,
    batch_size: int = 1,
    seed: int = 0,
    node_mask_fn=None,
    adj_aux=None,
    eval_adj_fn=None,
    batch_by_graph: bool = False,
    eval_batch_size: int | None = None,
    verbose: bool = True,
    log_every: int = 50,
    metrics_logger=None,
    profile_dir: str | None = None,
    profile_epochs: tuple = (2, 4),
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    checkpoint_auto_s: float = 0.0,
    resume: bool = False,
    track_test_per_trial: bool = False,
) -> FitResult:
    """Full training protocol over a trial dataset.

    ``adj_fn`` supplies per-minibatch connectivity. Preferred form: pass the
    arrays via ``adj_aux`` (entered into the jitted program as ARGUMENTS —
    closure-captured device arrays bake into the HLO as constants, bloating
    or breaking compiles) and ``adj_fn(graph_idx_batch, aux) -> adjacency
    pytree``; ``node_mask_fn`` follows the same convention. Without
    ``adj_aux``, single-argument closures still work for small graphs.
    ``adj_fn(graph_idx_batch) -> adjacency pytree`` supplies connectivity per
    minibatch (constant closure for single-graph runs; per-trial gather for
    multi-graph). Mirrors the reference driver loop at
    ``ode_nn_ngraph_sim.py:448-467``.

    ``eval_adj_fn`` (default: ``adj_fn``) lets val/test use a different
    connectivity gather than training — the bucketed multigraph stacks
    (``multigraph_pallas2_fns``) keep the train bucket's chunk grid small.
    ``batch_by_graph=True`` builds graph-HOMOGENEOUS minibatches
    (``epoch_batches_grouped``), required by adj_fns that read one shared
    plan per batch.
    """
    # adj_fns that read ONE shared plan per minibatch (graph_idx[0], e.g.
    # multigraph_pallas2_fns) declare it; running them with mixed-graph
    # batches would silently apply the wrong connectivity to most samples
    for f in (adj_fn, eval_adj_fn):
        if (f is not None and getattr(f, "requires_grouped_batches", False)
                and not batch_by_graph):
            raise ValueError(
                f"{getattr(f, '__name__', 'adj_fn')} applies one graph's "
                "plan to the whole minibatch: it requires graph-homogeneous "
                "batches — call fit(..., batch_by_graph=True)"
            )
    # node-view adjacencies are only valid for the graphs they were built
    # for — a trial of a larger graph would silently lose its high rows
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
    d = _data_to_device(data)
    if adj_aux is not None:
        d["__adj_aux__"] = jax.tree_util.tree_map(jnp.asarray, adj_aux)
    opt_state = optimizer.init(params)
    # connectivity providers that build their adjacency at a node-bucket
    # width below the data's global padding declare it on the fn (attribute
    # convention like requires_grouped_batches); the train program then runs
    # at that width — same math (sliced rows are all-padding), less traffic
    train_epoch = make_train_epoch_fn(
        model, optimizer, adj_fn, node_mask_fn,
        n_view=getattr(adj_fn, "n_view", None))
    e_adj_fn = eval_adj_fn or adj_fn
    # eval must see every val/test graph at full width: a node-view train
    # adjacency reused for eval (eval_adj_fn omitted) would silently gather
    # a TRAIN graph's sliced adjacency for eval-graph trials
    for _idx, _name in ((val_idx, "val_idx"), (test_idx, "test_idx")):
        _check_view(e_adj_fn, _idx, _name,
                    "Pass eval_adj_fn (the full-width adjacency — e.g. "
                    "MultigraphConnectivity.eval_adj_fn / fit_kwargs()), or "
                    "rebuild connectivity with train_node_view=False.")
    e_n_view = getattr(e_adj_fn, "n_view", None)
    evaluate = make_eval_fn(model, e_adj_fn, node_mask_fn, n_view=e_n_view)
    evaluate_per_trial = (
        make_eval_per_trial_fn(model, e_adj_fn, node_mask_fn, n_view=e_n_view)
        if track_test_per_trial else None
    )

    ebs = eval_batch_size or max(batch_size, 8)
    rng = np.random.default_rng(seed)
    if batch_by_graph:
        val_bi, val_bw = epoch_batches_grouped(val_idx, data.graph_idx, ebs, None)
        test_bi, test_bw = epoch_batches_grouped(test_idx, data.graph_idx, ebs, None)
    else:
        val_bi, val_bw = epoch_batches(len(val_idx), ebs, None)
        test_bi, test_bw = epoch_batches(len(test_idx), ebs, None)
        val_bi = np.asarray(val_idx, np.int32)[val_bi]
        test_bi = np.asarray(test_idx, np.int32)[test_bi]

    best_val = float("inf")
    best_epoch = -1
    best_params = params  # snapshot at each val improvement (pytrees are
    # immutable, so this is an alias, not a copy — one extra params-sized
    # live buffer at most)
    test_loss = float("nan")
    test_loss_all = None
    test_time = 0.0
    history, epoch_times = [], []
    start_epoch = 0

    ckpt_on_disk = False  # restored-from or written-to this run
    if checkpoint_dir and resume:
        import os

        from gn_ode_sir_tpu.train.checkpoint import restore_with_layout_ladder

        if os.path.isdir(os.path.join(checkpoint_dir, "state")):
            ckpt_on_disk = True
            target = {
                "params": params, "opt_state": opt_state, "epoch": 0,
                "best_val": 0.0, "best_epoch": 0, "test_loss": 0.0,
            }
            # Optional key-groups, newest layout first: "test_time" (round
            # 5 — so a resumed run whose val never re-improves still
            # reports the real inference wall in the n_ode_time CSV
            # column), "best_params" (round 4 — the serving snapshot at
            # the best-val epoch) and, on OOD runs, "test_loss_all" (the
            # per-trial test vector for the first OOD CSV,
            # ode_nn_ngraph_sim.py:483). The ladder tries every subset so
            # any checkpoint generation restores.
            groups = [{"test_time": 0.0}, {"best_params": params}]
            if track_test_per_trial:
                groups.append({"test_loss_all": np.zeros(len(test_idx))})
            st = restore_with_layout_ladder(checkpoint_dir, target, groups)
            if track_test_per_trial and "test_loss_all" in st:
                test_loss_all = np.asarray(st["test_loss_all"])
            params, opt_state = st["params"], st["opt_state"]
            best_params = st.get("best_params", params)
            start_epoch = int(st["epoch"]) + 1
            best_val = float(st["best_val"])
            best_epoch = int(st["best_epoch"])
            test_loss = float(st["test_loss"])
            test_time = float(st.get("test_time", 0.0))
            # fast-forward the batch-shuffle rng so epoch k of a resumed
            # run draws the SAME permutation as epoch k of an
            # uninterrupted one — crash+resume then reproduces the
            # original training trace (the per-epoch train rng_key is
            # already epoch-indexed via fold_in)
            for _ in range(start_epoch):
                if batch_by_graph:
                    epoch_batches_grouped(train_idx, data.graph_idx, batch_size, rng)
                else:
                    epoch_batches(len(train_idx), batch_size, rng)
            if verbose:
                print(f"resumed from {checkpoint_dir} at epoch {start_epoch}")

    def _save(epoch):
        nonlocal ckpt_on_disk
        ckpt_on_disk = True
        from gn_ode_sir_tpu.train.checkpoint import save_checkpoint

        # NaN test_loss (no val improvement yet) is persisted as-is: coercing
        # it to 0.0 would restore as a fake perfect score on resume.
        state = {
            "params": params, "opt_state": opt_state, "epoch": epoch,
            "best_val": best_val, "best_epoch": best_epoch,
            "test_loss": test_loss, "best_params": best_params,
            "test_time": float(test_time),
        }
        if track_test_per_trial:
            state["test_loss_all"] = (
                np.full(len(test_idx), np.nan)
                if test_loss_all is None else np.asarray(test_loss_all)
            )
        save_checkpoint(checkpoint_dir, state)

    base_key = jax.random.PRNGKey(seed + 1)
    profiling = False
    for epoch in range(start_epoch, epochs):
        if profile_dir is not None and epoch == profile_epochs[0]:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        t0 = time.perf_counter()
        if batch_by_graph:
            bi, bw = epoch_batches_grouped(train_idx, data.graph_idx, batch_size, rng)
        else:
            bi, bw = epoch_batches(len(train_idx), batch_size, rng)
            bi = np.asarray(train_idx, np.int32)[bi]
        epoch_key = jax.random.fold_in(base_key, epoch)
        params, opt_state, train_loss = train_epoch(params, opt_state, d, bi, bw, epoch_key)
        val_loss = float(evaluate(params, d, val_bi, val_bw))
        jax.block_until_ready(val_loss)
        epoch_times.append(time.perf_counter() - t0)
        train_loss = float(train_loss)
        history.append((epoch, train_loss, val_loss))
        if profiling and epoch >= profile_epochs[1]:
            jax.profiler.stop_trace()
            profiling = False
        if metrics_logger is not None:
            metrics_logger.log(
                epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                epoch_s=epoch_times[-1],
            )

        if val_loss < best_val:
            best_val = val_loss
            best_epoch = epoch
            best_params = params
            t1 = time.perf_counter()
            test_loss = float(evaluate(params, d, test_bi, test_bw))
            if evaluate_per_trial is not None:
                test_loss_all = np.asarray(
                    evaluate_per_trial(params, d, np.asarray(test_idx, np.int32))
                )
            test_time = time.perf_counter() - t1
        if verbose and (epoch % log_every == 0 or epoch == epochs - 1):
            print(
                f"Epoch: {epoch:03d}, Train Loss: {train_loss:.10f}, "
                f"Val Loss: {val_loss:.10f} ({epoch_times[-1]:.3f}s)"
            )
        # auto cadence: once the first measured epochs project the run past
        # ``checkpoint_auto_s`` seconds, checkpoint every ~5 wall-minutes —
        # the mitigation for this environment's documented failure mode
        # (mid-run TPU worker death, CLAUDE.md) without configuring runs
        # that finish in seconds.
        if (checkpoint_dir and checkpoint_auto_s and not checkpoint_every
                and epoch == start_epoch + 2):
            # steady-state epoch cost = the MIN of the first three: the
            # first epoch carries the jit compile (minutes through the TPU
            # tunnel) and would both over-trigger and set a cadence of
            # seconds if averaged in
            steady_s = float(np.min(epoch_times[-3:]))
            projected = (
                float(np.sum(epoch_times))
                + steady_s * (epochs - epoch - 1)
            )
            if projected > checkpoint_auto_s:
                checkpoint_every = max(1, int(300.0 / steady_s))
                if verbose:
                    print(f"auto-checkpoint: projected {projected/60:.1f} min "
                          f"run -> saving every {checkpoint_every} epochs")
        if checkpoint_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            _save(epoch)

    if profiling:
        jax.profiler.stop_trace()
    # Final-save rule: an explicitly-requested checkpoint_dir always gets
    # the end-of-run save (the resume contract), EXCEPT when it was armed
    # only via the auto cadence (checkpoint_auto_s) and the projection
    # decided the run was short — those runs must not pay an Orbax write
    # through the tunnel just because the worker plumbs a dir by default.
    # If a checkpoint is ALREADY on disk (restored-from or written mid-run)
    # the final save is mandatory regardless: otherwise a resumed run whose
    # short tail never re-arms the cadence would complete while leaving the
    # stale crash-era state as the directory's truth.
    if (checkpoint_dir and epochs > start_epoch
            and (checkpoint_every or ckpt_on_disk or not checkpoint_auto_s)):
        _save(epochs - 1)
    return FitResult(
        params=params,
        opt_state=opt_state,
        best_epoch=best_epoch,
        best_val_loss=best_val,
        test_loss=test_loss,
        test_time=test_time,
        history=history,
        epoch_times=epoch_times,
        test_loss_all=test_loss_all,
        best_params=best_params,
    )
