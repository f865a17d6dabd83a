"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def render_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices with a single 'tiles' axis.

    Rendering is embarrassingly data-parallel over pixels; a 1D axis lets
    XLA lay reductions onto the ICI ring. Multi-host: call
    ``jax.distributed.initialize`` first and pass ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (row/tile) axis across the mesh."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
