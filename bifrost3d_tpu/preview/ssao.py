"""Screen-space ambient occlusion (Alchemy AO) with bilateral blur.

Counterpart of the DX11 SSAO pass (``DX11Renderer/SSAO.*``, SURVEY.md
§2.5): Alchemy-style AO over the G-buffer's view positions/normals with
interleaved per-pixel sample rotation and a depth-aware (bilateral) blur.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bifrost3d_tpu.sampling.hashes import pcg2d, uint_to_unit_float


@partial(jax.jit, static_argnames=("sample_count",))
def ssao(view_position, view_normal, valid_mask, world_radius: float = 0.25,
         bias: float = 0.01, intensity: float = 1.0, sample_count: int = 8):
    """→ occlusion [h, w] in [0 (occluded), 1 (open)].

    Alchemy AO: per pixel, sample nearby screen points, re-read their view
    positions, and accumulate max(0, dot(v, n) + bias·z) / (|v|² + eps).
    """
    h, w = view_position.shape[0], view_position.shape[1]
    xi = jnp.arange(w, dtype=jnp.uint32)[None, :]
    yi = jnp.arange(h, dtype=jnp.uint32)[:, None]
    rot_hash, _ = pcg2d(jnp.broadcast_to(xi, (h, w)), jnp.broadcast_to(yi, (h, w)))
    rot = uint_to_unit_float(rot_hash) * 2.0 * np.pi

    depth = view_position[..., 2]
    # Screen-space radius ∝ world radius / depth (projective scaling).
    radius_px = world_radius / jnp.maximum(depth, 0.1) * (h * 0.5)
    radius_px = jnp.clip(radius_px, 2.0, h * 0.25)

    occlusion = jnp.zeros((h, w))
    for s in range(sample_count):
        angle = rot + s * (2.0 * np.pi / sample_count)
        r = jnp.maximum(radius_px * ((s + 0.5) / sample_count) ** 0.75, 1.0)
        dx = jnp.round(jnp.cos(angle) * r).astype(jnp.int32)
        dy = jnp.round(jnp.sin(angle) * r).astype(jnp.int32)
        sx = jnp.clip(jnp.broadcast_to(xi.astype(jnp.int32), (h, w)) + dx, 0, w - 1)
        sy = jnp.clip(jnp.broadcast_to(yi.astype(jnp.int32), (h, w)) + dy, 0, h - 1)
        p = view_position[sy, sx]
        v = p - view_position
        vn = jnp.sum(v * view_normal, axis=-1)
        vv = jnp.sum(v * v, axis=-1)
        contrib = jnp.maximum(vn - bias * depth, 0.0) / (vv + 1e-4)
        sample_valid = valid_mask[sy, sx] & valid_mask
        occlusion = occlusion + jnp.where(sample_valid, contrib, 0.0)

    ao = jnp.maximum(1.0 - 2.0 * intensity / sample_count * occlusion, 0.0)
    return jnp.where(valid_mask, ao, 1.0)


@partial(jax.jit, static_argnames=("support",))
def bilateral_blur(ao, depth, support: int = 4, depth_sigma: float = 0.1):
    """Depth-aware cross blur (the reference's bilateral box/cross filter)."""
    acc = jnp.zeros_like(ao)
    wsum = jnp.zeros_like(ao)
    for axis in (0, 1):
        for offset in range(-support, support + 1):
            shifted_ao = jnp.roll(ao, offset, axis=axis)
            shifted_depth = jnp.roll(depth, offset, axis=axis)
            w = jnp.exp(-jnp.square(shifted_depth - depth)
                        / (2.0 * depth_sigma * depth_sigma))
            acc = acc + shifted_ao * w
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-6)
