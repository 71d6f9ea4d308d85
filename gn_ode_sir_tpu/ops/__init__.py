"""Kernel layer: sparse message-passing primitives for TPU.

Replaces the reference's external native dependencies (torch-scatter CUDA
``scatter_add_``/``scatter(reduce='mul')`` at ``ode_nn_ngraph_sim.py:73`` and
``dmp.py:91-93``, torch-sparse/torch-geometric SpMM) with:

- ``segment_sum`` / ``segment_prod`` / ``segment_max`` — XLA segment ops over
  sorted COO edge lists,
- ``spmm_coo`` / ``spmm_dense`` / ``spmm`` — sparse matmul with an MXU dense
  path for small/mid graphs and a gather+segment-sum path for large ones,
- ``Pallas2Adj`` (``ops.pallas_spmm2``) — the chunked Pallas TPU kernel for
  the large-graph sorted-COO path (the measured-fastest sparse backend),
- ``gcn_norm_edges`` — symmetric GCN normalization D^-1/2 (A+I) D^-1/2.
"""

from gn_ode_sir_tpu.ops.segment import segment_prod, segment_sum
from gn_ode_sir_tpu.ops.spmm import (
    DENSE_NODE_THRESHOLD,
    gcn_norm_edges,
    spmm,
    spmm_coo,
    spmm_coo_batched,
    spmm_dense,
)
from gn_ode_sir_tpu.ops.ell import (
    EllAdj,
    build_ell_buckets,
    row_offsets_from_sorted_dst,
)

__all__ = [
    "segment_sum",
    "segment_prod",
    "spmm",
    "spmm_coo",
    "spmm_coo_batched",
    "spmm_dense",
    "row_offsets_from_sorted_dst",
    "gcn_norm_edges",
    "EllAdj",
    "build_ell_buckets",
    "DENSE_NODE_THRESHOLD",
]
