"""Sharded progressive rendering over a device mesh.

Pixel rows shard across the 'tiles' axis; the sphere scene (later: BVH +
vertex + material + light buffers) replicates on every device. Each device
renders its rows independently — zero collectives in the forward pass; the
progressive accumulation stays device-local so HBM never round-trips
through the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from bifrost3d_tpu.integrator.smallpt import render_smallpt_pixels
from bifrost3d_tpu.parallel.mesh import TILE_AXIS, pad_to_multiple, render_mesh
from bifrost3d_tpu.scene.spheres import SphereScene


def make_sharded_smallpt(mesh, width: int, height: int):
    """Build a jitted sharded render fn: (scene, accumulation) → [H, W, 3].

    Rows are padded to a multiple of the mesh size, sharded over the
    'tiles' axis, rendered independently per device, and cropped back.
    """
    n_dev = mesh.devices.size
    padded_h = pad_to_multiple(height, n_dev)
    y_all = jnp.broadcast_to(
        jnp.arange(padded_h, dtype=jnp.uint32)[:, None], (padded_h, width))
    x_all = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.uint32)[None, :], (padded_h, width))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P()),
             out_specs=P(TILE_AXIS))
    def _render_shard(scene, x, y, accumulation):
        return render_smallpt_pixels(scene, x, y, width, height, accumulation)

    @jax.jit
    def render(scene: SphereScene, accumulation):
        img = _render_shard(scene, x_all, y_all, jnp.asarray(accumulation, jnp.uint32))
        return img[:height]

    return render


def render_smallpt_sharded(scene: SphereScene, width: int, height: int,
                           accumulations: int, mesh=None) -> jnp.ndarray:
    """Progressive sharded render (row 0 = bottom, like the reference)."""
    if mesh is None:
        mesh = render_mesh()
    render = make_sharded_smallpt(mesh, width, height)
    buffer = jnp.zeros((height, width, 3), jnp.float32)
    for n in range(1, accumulations + 1):
        frame = render(scene, n)
        buffer = buffer + (frame - buffer) / n
    return buffer
