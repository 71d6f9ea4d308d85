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

from gn_ode_sir_tpu.ops.segment import segment_sum
from gn_ode_sir_tpu.train.loss import l1_sir_loss


def spmm_edge_sharded(src_local, dst_local, x, n_nodes: int, axis: str = "edge", w_local=None):
    """Edge-sharded SpMM (call inside ``shard_map``).

    Each device owns a contiguous slice of the dst-sorted edge list; ``x``
    ([B, n, h]) is replicated across the axis. Partial destination sums are
    psum-reduced so every device returns the full [B, n, h] aggregate.
    """
    msgs = x[:, src_local, :]
    if w_local is not None:
        msgs = msgs * w_local[None, :, None]
    partial = jax.vmap(
        lambda m: segment_sum(m, dst_local, n_nodes, indices_are_sorted=True)
    )(msgs)
    return jax.lax.psum(partial, axis)


def make_spmd_train_step(model, optimizer, adj_fn, mesh, axis: str = "data") -> Callable:
    """Data-parallel train step: batch sharded on ``axis``, params replicated.

    Returns ``step(params, opt_state, batch) -> (params, opt_state, loss)``
    where ``batch`` is a dict with leading batch axes divisible by the mesh
    axis size: s0/i0/r0 [B, n], beta/gamma/weight [B], labels [B, T, n, 3],
    graph_idx [B].
    """

    def local_step(params, opt_state, batch):
        def loss_fn(p):
            adj = adj_fn(batch["graph_idx"])
            pred = model.predict(
                p, adj, batch["s0"], batch["i0"], batch["r0"],
                batch["beta"], batch["gamma"],
            )
            return l1_sir_loss(pred, batch["labels"], trial_weight=batch.get("weight"))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_specs = {
        "s0": P(axis, None),
        "i0": P(axis, None),
        "r0": P(axis, None),
        "beta": P(axis),
        "gamma": P(axis),
        "weight": P(axis),
        "labels": P(axis, None, None, None),
        "graph_idx": P(axis),
    }

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), batch_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
