"""Segment reductions over edge lists.

TPU-native equivalents of torch_scatter's ``scatter(reduce=...)`` used by the
reference for SpMM aggregation (``ode_nn_ngraph_sim.py:73``) and DMP's
multiplicative cavity aggregation (``dmp.py:90-96``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, indices_are_sorted: bool = True):
    """Sum ``data`` rows into ``num_segments`` buckets keyed by ``segment_ids``."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_prod(data, segment_ids, num_segments: int, indices_are_sorted: bool = True):
    """Product-reduce ``data`` into segments (DMP cavity aggregation).

    Empty segments return 1 (multiplicative identity), matching
    torch_scatter ``scatter(reduce='mul')`` semantics used at ``dmp.py:91``.
    """
    return jax.ops.segment_prod(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
