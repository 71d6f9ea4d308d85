"""SPMD training step (data parallelism) + edge-sharded SpMM.

Data parallelism: the trial batch is split over the 'data' mesh axis inside
``shard_map``; each device computes loss/grads on its shard and gradients
are mean-reduced with ``psum`` over ICI — the XLA-collective replacement for
the DDP the reference never had (SURVEY.md §2.2).

Edge parallelism: for graphs whose edge list dwarfs a single device (the
"long-context" axis of this workload — SURVEY.md §5), the dst-sorted edge
list is sharded across an 'edge' axis; each device segment-sums its local
edges and partial node sums are ``psum``-combined.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

import dataclasses
from functools import partial

import numpy as onp

from gn_ode_sir_tpu.ops.segment import segment_sum
from gn_ode_sir_tpu.train.loss import l1_sir_loss_sums


def _local_spmm(src, dst, w, x, n_nodes):
    """Local-edge-shard SpMM. src/dst/w are [E_local] (shared graph) or
    [B, E_local] (per-sample multigraph rows gathered from a padded
    GraphBatch whose edge dim is sharded over the edge axis)."""
    if src.ndim == 1:
        msgs = x[:, src, :] * w[None, :, None]
        return jax.vmap(
            lambda m: segment_sum(m, dst, n_nodes, indices_are_sorted=False)
        )(msgs)

    def one(s, d, ww, xb):
        return segment_sum(xb[s] * ww[:, None], d, n_nodes,
                           indices_are_sorted=False)

    return jax.vmap(one)(src, dst, w, x)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _edge_spmm(axis, n_nodes, src, dst, w, x):
    return jax.lax.psum(_local_spmm(src, dst, w, x, n_nodes), axis)


def _edge_spmm_fwd(axis, n_nodes, src, dst, w, x):
    return _edge_spmm(axis, n_nodes, src, dst, w, x), (src, dst, w, x)


def _edge_spmm_bwd(axis, n_nodes, res, g):
    """Cotangents are psum-reduced over the edge axis so every upstream
    (replicated) computation receives the FULL gradient — this is what makes
    plain ``jax.grad`` of an edge-sharded model correct with no manual
    gradient reductions anywhere else."""
    src, dst, w, x = res
    # d/dx: transpose SpMM over the local edge shard (swap src/dst), psummed.
    dx_local = _local_spmm(dst, src, w, g, x.shape[1])
    dx = jax.lax.psum(dx_local, axis)
    # d/dw: per-local-edge inner product of gathered x and g rows
    # (per-sample rows keep their batch axis; shared rows sum over it).
    if src.ndim == 1:
        dw = (x[:, src, :] * g[:, dst, :]).sum(axis=(0, 2))
    else:
        dw = jax.vmap(lambda s, d, xb, gb: (xb[s] * gb[d]).sum(-1))(src, dst, x, g)
    zeros_int = onp.zeros(src.shape, jax.dtypes.float0)
    return zeros_int, onp.zeros(dst.shape, jax.dtypes.float0), dw, dx


_edge_spmm.defvjp(_edge_spmm_fwd, _edge_spmm_bwd)


def spmm_edge_sharded(src_local, dst_local, x, n_nodes: int, axis: str = "edge", w_local=None):
    """Edge-sharded SpMM (call inside ``shard_map``).

    Each device owns a slice of the edge list; ``x`` ([B, n, h]) is
    replicated across ``axis``. Partial destination sums are psum-reduced so
    every device returns the full [B, n, h] aggregate, and the custom VJP
    psums input cotangents so autodiff through it stays replicated.
    """
    if w_local is None:
        w_local = jnp.ones(src_local.shape, x.dtype)
    return _edge_spmm(axis, n_nodes, src_local, dst_local, w_local, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EdgeShardedCooAdj:
    """Adjacency pytree over a locally-owned edge shard (use inside shard_map).

    Drop-in for :class:`~gn_ode_sir_tpu.ops.adjacency.CooAdj` — models built
    on ``adj.matvec`` become edge-parallel without modification.
    """

    src: jnp.ndarray  # [E_local]
    dst: jnp.ndarray
    w: jnp.ndarray
    n_nodes: int
    axis: str = "edge"

    def matvec(self, x):
        return spmm_edge_sharded(self.src, self.dst, x, self.n_nodes, self.axis, self.w)

    def tree_flatten(self):
        return (self.src, self.dst, self.w), (self.n_nodes, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_nodes=aux[0], axis=aux[1])


def _batch_specs(axis: str) -> dict:
    """PartitionSpecs for the standard trial-batch dict (leading dim on
    ``axis``): s0/i0/r0 [B, n], beta/gamma/weight [B], labels [B, T, n, 3],
    graph_idx [B]."""
    return {
        "s0": P(axis, None),
        "i0": P(axis, None),
        "r0": P(axis, None),
        "beta": P(axis),
        "gamma": P(axis),
        "weight": P(axis),
        "labels": P(axis, None, None, None),
        "graph_idx": P(axis),
    }


def _default_batch_keys(batch):
    """Fill the OPTIONAL trial-batch keys with their neutral defaults so
    callers aren't forced to carry them: missing ``weight`` means
    equal-weighted trials (what ``trial_weight=None`` meant) and missing
    ``graph_idx`` means the single-graph protocol. Without this, shard_map
    raises an opaque pytree-structure mismatch against the full spec dict."""
    if "weight" not in batch:
        batch = dict(batch, weight=jnp.ones_like(batch["beta"]))
    if "graph_idx" not in batch:
        batch = dict(
            batch, graph_idx=jnp.zeros(batch["beta"].shape[0], jnp.int32)
        )
    return batch


def _build_spmd_step(model, optimizer, mesh, data_axis: str,
                     connect: Callable, extra_specs: tuple,
                     dropout_rng: bool = False) -> Callable:
    """Shared core of every SPMD train-step builder.

    ``connect(batch, *extra) -> (adj, node_mask)`` is the ONLY part the
    variants differ in; ``extra_specs`` are the PartitionSpecs of the
    step's trailing arguments after the batch dict. The loss reduction,
    gradient psum, and optimizer update are identical everywhere:

    - the global item-weighted mean is psum(numerator)/psum(weight-sum) —
      pmean of per-shard means would be wrong whenever trial weights or
      padding distribute unevenly across data shards;
    - gradients reduce over ``data_axis`` ONLY: when connectivity is
      edge-sharded, :func:`spmm_edge_sharded`'s custom VJP already
      psum-replicates gradients across the edge axis.

    ``dropout_rng=True`` appends a trailing PRNGKey argument to the step
    and runs the forward with ``train=True`` like :func:`fit` does —
    required for stochastic-regularization models (GCN/GIN dropout); each
    data shard folds in its axis index so devices draw independent masks.
    Deterministic models (GNODE) keep the default, where the forward is
    ``train=False`` and no key is threaded.
    """

    def local_step(params, opt_state, batch, *extra):
        if dropout_rng:
            *extra, rng = extra
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        adj, node_mask = connect(batch, *extra)

        def loss_fn(p):
            kw = {"rng": rng, "train": True} if dropout_rng else {}
            pred = model.predict(
                p, adj, batch["s0"], batch["i0"], batch["r0"],
                batch["beta"], batch["gamma"], **kw,
            )
            num, den = l1_sir_loss_sums(
                pred, batch["labels"], trial_weight=batch["weight"],
                node_mask=node_mask,
            )
            return num, den

        (num, den), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        den_tot = jax.lax.psum(den, data_axis)
        loss = jax.lax.psum(num, data_axis) / den_tot
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, data_axis) / den_tot, grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng_specs = (P(),) if dropout_rng else ()
    sharded = jax.jit(jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), _batch_specs(data_axis), *extra_specs,
                  *rng_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))

    def step(params, opt_state, batch, *extra):
        return sharded(params, opt_state, _default_batch_keys(batch), *extra)

    return step


def make_spmd_train_step(
    model, optimizer, adj_fn, mesh, axis: str = "data",
    aux_example=None, node_mask_fn=None, dropout_rng: bool = False,
) -> Callable:
    """Data-parallel train step: batch sharded on ``axis``, params replicated.

    Returns ``step(params, opt_state, batch) -> (params, opt_state, loss)``
    where ``batch`` is a dict with leading batch axes divisible by the mesh
    axis size (see :func:`_batch_specs`; missing ``weight``/``graph_idx``
    keys default to equal weights / graph 0).

    ``dropout_rng=True``: the step takes a trailing PRNGKey and runs the
    forward with ``train=True`` — pass this for GCN/GIN so SPMD training
    applies the same dropout the single-device :func:`fit` engine does
    (``train/loop.py`` trains with ``train=True`` + rng); without it the
    forward is deterministic and dropout models silently skip their
    regularization.

    Multi-graph batches: pass ``aux_example`` (the per-graph connectivity
    dict from :func:`gn_ode_sir_tpu.train.multigraph_adj_fns` — replicated
    across the mesh; per-trial rows are gathered on device) and the step
    becomes ``step(params, opt_state, batch, aux)``; ``adj_fn``/
    ``node_mask_fn`` then take ``(graph_idx, aux)``, the same convention as
    :func:`gn_ode_sir_tpu.train.fit`. The aux rides as an ARGUMENT — closure
    capture would bake it into the HLO as a constant.
    """
    if aux_example is not None:
        def connect(batch, aux):
            gi = batch["graph_idx"]
            mask = None if node_mask_fn is None else node_mask_fn(gi, aux)
            return adj_fn(gi, aux), mask

        aux_specs = jax.tree_util.tree_map(lambda _: P(), aux_example)
        return _build_spmd_step(model, optimizer, mesh, axis, connect,
                                (aux_specs,), dropout_rng=dropout_rng)

    def connect(batch):
        gi = batch["graph_idx"]
        mask = None if node_mask_fn is None else node_mask_fn(gi)
        return adj_fn(gi), mask

    return _build_spmd_step(model, optimizer, mesh, axis, connect, (),
                            dropout_rng=dropout_rng)


def make_spmd_train_step_2d(
    model, optimizer, mesh, n_nodes: int,
    data_axis: str = "data", edge_axis: str = "edge",
    dropout_rng: bool = False,
) -> Callable:
    """dp x edge-parallel training step over a 2-D mesh.

    The trial batch is sharded over ``data_axis`` and the dst-sorted edge
    list over ``edge_axis``; message passing runs through
    :class:`EdgeShardedCooAdj` (psum over ICI inside the ODE function).

    Batch dict as in :func:`make_spmd_train_step`; edges passed separately
    as (src [E], dst [E], w [E]) with E divisible by the edge-axis size.
    """

    def connect(batch, src, dst, w):
        return EdgeShardedCooAdj(src, dst, w, n_nodes, edge_axis), None

    return _build_spmd_step(
        model, optimizer, mesh, data_axis, connect,
        (P(edge_axis), P(edge_axis), P(edge_axis)),
        dropout_rng=dropout_rng,
    )


def make_spmd_multigraph_train_step_2d(
    model, optimizer, mesh, n_nodes: int, aux_example,
    node_mask_fn=None, data_axis: str = "data", edge_axis: str = "edge",
    dropout_rng: bool = False,
) -> Callable:
    """dp x edge-parallel training step with PER-SAMPLE multigraph
    connectivity — the composition the enron-scale ngraphs workload needs:
    trials shard over ``data_axis`` AND every graph's padded edge row
    shards over ``edge_axis``, so no single device ever holds a full
    33k-node graph's edge list.

    ``aux_example`` is the COO multigraph aux from
    :func:`gn_ode_sir_tpu.train.multigraph_adj_fns(kind='coo')`:
    src/dst/w [G, E] (E divisible by the edge-axis size) + node_mask
    [G, n]. Each device gathers its trials' rows of its LOCAL edge slice —
    [B_local, E_local] — and message passing runs through the per-sample
    edge-sharded SpMM.

    Returns ``step(params, opt_state, batch, aux)``; batch dict as in
    :func:`make_spmd_train_step`.
    """

    def connect(batch, aux):
        gi = batch["graph_idx"]
        adj = EdgeShardedCooAdj(
            aux["src"][gi], aux["dst"][gi], aux["w"][gi], n_nodes, edge_axis
        )
        mask = None if node_mask_fn is None else node_mask_fn(gi, aux)
        return adj, mask

    aux_specs = {
        k: (P(None, edge_axis) if k in ("src", "dst", "w") else P())
        for k in aux_example
    }
    return _build_spmd_step(model, optimizer, mesh, data_axis, connect,
                            (aux_specs,), dropout_rng=dropout_rng)


def make_spmd_predict_fn(
    model, adj_fn, mesh, axis: str = "data",
    aux_example=None, node_mask_fn=None, reduce_fn=None,
) -> Callable:
    """Data-parallel batched INFERENCE — the serving path.

    Trials shard over ``axis``, params replicate, each device runs the whole
    forward on its shard, and the [T, B, n, 3] trajectory comes back
    batch-sharded (no collective needed — inference has no reduction). One
    jitted program serves any trial batch whose leading dim divides the mesh
    axis; this is how a production deployment scores large trial matrices
    (e.g. epidemic what-if sweeps) without ever forming a device-crossing
    batch. Conventions mirror :func:`make_spmd_train_step`: with
    ``aux_example`` the call is ``predict(params, batch, aux)`` and
    ``adj_fn``/``node_mask_fn`` take ``(graph_idx, aux)``; node masks zero
    padded rows of multigraph outputs so downstream consumers never read
    garbage nodes.

    ``reduce_fn`` (summary-only serving): a per-scenario reduction
    ``[T, b, n, 3] -> [b, k]`` applied INSIDE each shard before the output
    leaves the device — the readback is then ``[B, k]`` instead of the full
    trajectory. The reduction is per-scenario, so sharding it needs no
    collective: each device summarizes exactly its own batch shard. When
    ``node_mask_fn`` is also given, the reduction is called as
    ``reduce_fn(pred, mask)`` with the shard's [b, n] node mask so padded
    multigraph rows don't bias per-node means.
    """

    in_batch = {
        k: P(axis, None) if k in ("s0", "i0", "r0") else P(axis)
        for k in ("s0", "i0", "r0", "beta", "gamma", "graph_idx")
    }

    def local_predict(params, batch, *extra):
        gi = batch["graph_idx"]
        if aux_example is not None:
            adj = adj_fn(gi, extra[0])
            mask = None if node_mask_fn is None else node_mask_fn(gi, extra[0])
        else:
            adj = adj_fn(gi)
            mask = None if node_mask_fn is None else node_mask_fn(gi)
        pred = model.predict(
            params, adj, batch["s0"], batch["i0"], batch["r0"],
            batch["beta"], batch["gamma"],
        )
        if mask is not None:
            pred = pred * mask[None, :, :, None]
        if reduce_fn is not None:
            # the mask rides along so per-node means stay fraction-exact
            # on padded multigraph batches (zeroed padding rows must not
            # be averaged in)
            pred = reduce_fn(pred, mask) if mask is not None else reduce_fn(pred)  # [b, k]
        return pred

    extra_specs = ()
    if aux_example is not None:
        extra_specs = (jax.tree_util.tree_map(lambda _: P(), aux_example),)
    out_spec = (P(axis, None) if reduce_fn is not None
                else P(None, axis, None, None))
    sharded = jax.jit(jax.shard_map(
        local_predict,
        mesh=mesh,
        in_specs=(P(), in_batch, *extra_specs),
        out_specs=out_spec,
        check_vma=False,
    ))

    def predict(params, batch, *extra):
        if "graph_idx" not in batch:
            batch = dict(
                batch, graph_idx=jnp.zeros(batch["beta"].shape[0], jnp.int32)
            )
        return sharded(params, batch, *extra)

    return predict
