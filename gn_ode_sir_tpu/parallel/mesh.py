"""Device mesh construction + sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` puts every device on the first axis. On a v5e-8 the
    default is ``Mesh((8,), ('data',))``; multi-axis layouts (e.g.
    ``shape=(4, 2), axis_names=('data', 'edge')``) ride ICI for both axes.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data", rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``; replicate the rest."""
    spec = P(axis, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
