"""Parallelism layer: device meshes, sharded simulation, SPMD training.

The reference has no distributed execution at all (SURVEY.md §2.2) — its
only "parallelism" is a block-diagonal batch and sequential subprocesses.
This layer provides the TPU-native equivalents called for there:

- **data parallelism**: trial batches sharded over a ``Mesh('data')`` axis,
  gradients ``psum``-reduced over ICI (``make_spmd_train_step``).
- **simulation parallelism**: Monte-Carlo trajectories are embarrassingly
  parallel; ``simulate_sir_sharded`` splits them across devices via
  ``shard_map`` and psums the indicator counts.
- **edge parallelism** (the graph-world analogue of sequence/context
  parallelism): SpMM over a dst-sharded edge list with partial segment-sums
  psummed across the 'edge' axis (``spmm_edge_sharded``).

TP/PP/EP are N/A for this model family (1-2 Linear layers, no MoE) — the
mesh API leaves room for a 'model' axis but no component requires it.
"""

from gn_ode_sir_tpu.parallel.distributed import init_distributed
from gn_ode_sir_tpu.parallel.mesh import data_sharding, make_mesh, replicated_sharding
from gn_ode_sir_tpu.parallel.sim import simulate_sir_sharded
from gn_ode_sir_tpu.parallel.spmd import (
    EdgeShardedCooAdj,
    make_spmd_predict_fn,
    make_spmd_train_step,
    make_spmd_multigraph_train_step_2d,
    make_spmd_train_step_2d,
    spmm_edge_sharded,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "simulate_sir_sharded",
    "make_spmd_predict_fn",
    "make_spmd_train_step",
    "make_spmd_multigraph_train_step_2d",
    "make_spmd_train_step_2d",
    "EdgeShardedCooAdj",
    "spmm_edge_sharded",
]
