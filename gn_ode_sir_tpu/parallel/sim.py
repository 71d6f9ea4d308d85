"""Device-sharded Monte-Carlo SIR simulation.

Trajectories are independent, so the 10k-sim label extraction
(reference hot loop #1, ``ode_nn.py:46-82``) scales linearly across the
mesh: each device runs ``sims / n_devices`` trajectories with a
device-unique RNG fold, and the [T, 3, n] indicator counts are
``psum``-reduced over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gn_ode_sir_tpu.sim.mc_sir import (
    _device_adjacency,
    _expand_ir_sums,
    _raw_key,
    _resolve_coins,
    _simulate_chunk,
)


def simulate_sir_sharded(
    graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    mesh,
    sims: int = 10000,
    max_time: int = 20,
    key=None,
    axis: str = "data",
    matmul: str = "auto",
    coins: str = "auto",
):
    """Per-node S/I/R probabilities [max_time, n] each, sims sharded on ``axis``."""
    key = jax.random.PRNGKey(0) if key is None else _raw_key(key)
    n_dev = mesh.shape[axis]
    sims_local = -(-sims // n_dev)  # ceil; total = sims_local * n_dev
    total = sims_local * n_dev

    # same auto policies as the single-device simulate_sir (mc_sir.py):
    # int8 MXU counts + unconditional int8 (I, R) carry + rbg16 coins on
    # TPU, bf16/f32/threefry elsewhere — the per-device program IS the
    # single-device program at sims_local, so the round-3 wins carry over
    coins = _resolve_coins(coins)
    if coins == "pallas":
        # never compiled under shard_map; a failed remote Pallas compile
        # wedges the tunnel's chip claim (CLAUDE.md), so reject up front
        # like simulate_sir_counts_many does for its batched path
        raise ValueError("the pallas coin kernel has no sharded path")
    if matmul == "auto":
        matmul = "bf16" if jax.default_backend() == "cpu" else "int8"
    state_i8 = matmul == "int8"
    a = _device_adjacency(graph, jnp.int8 if matmul == "int8" else jnp.bfloat16)
    seeds_mask = jnp.zeros(graph.n_nodes, jnp.float32)
    seeds_mask = seeds_mask.at[jnp.asarray(np.asarray(seed_nodes))].set(1.0)

    def local(a_, seeds_, key_):
        dev = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_, dev)
        ir = _simulate_chunk(  # [T, 2, n] (I, R) sums; S sums are implied
            a_, seeds_, float(beta), float(gamma), k, sims=sims_local,
            max_time=max_time, coins=coins, state_i8=state_i8,
        )
        return jax.lax.psum(ir, axis)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    counts = _expand_ir_sums(fn(a, seeds_mask, key), total)
    probs = np.asarray(counts, dtype=np.float64) / float(total)
    return probs[:, 0, :], probs[:, 1, :], probs[:, 2, :]
