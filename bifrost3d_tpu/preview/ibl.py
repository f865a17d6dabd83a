"""Prefiltered image-based lighting (GGX-convolved environment mips).

Counterpart of the DX11 EnvironmentManager's MIS-convolved IBL mip chain
(EnvironmentManager.cpp:36,110-125 + IBLConvolution.hlsl) and the
EnvironmentConvolution dev app (SURVEY.md §2.5, §2.7): each mip level
convolves the latlong map with the GGX lobe of increasing roughness, down
to a minimum resolution; shading fetches the level matching the surface
roughness with trilinear blending.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bifrost3d_tpu.lights.environment import (
    direction_to_latlong_uv,
    latlong_uv_to_direction,
)
from bifrost3d_tpu.sampling.distributions import ggx_vndf_sample_halfway
from bifrost3d_tpu.sampling.pmj import pmj02_bn_samples
from bifrost3d_tpu.math.vec import normalize, reflect, to_world

MIN_MIP_SIZE = 16


def _downsample2(img):
    h, w = img.shape[0] // 2, img.shape[1] // 2
    return 0.25 * (img[0::2, 0::2][:h, :w] + img[1::2, 0::2][:h, :w]
                   + img[0::2, 1::2][:h, :w] + img[1::2, 1::2][:h, :w])


def convolve_environment(environment, roughness_levels=None, samples: int = 64):
    """→ list of (roughness, latlong image) GGX-prefiltered mips.

    Level 0 is the unfiltered map; each subsequent level halves resolution
    (to a 16-px floor, EnvironmentManager.cpp:110-125) and convolves with
    the GGX lobe at its roughness (importance-sampled with VNDF halves).
    """
    env = jnp.asarray(environment, jnp.float32)
    if roughness_levels is None:
        n_levels = max(2, int(np.log2(env.shape[0] / MIN_MIP_SIZE)) + 1)
        roughness_levels = [i / (n_levels - 1) for i in range(n_levels)]

    u2 = jnp.asarray(pmj02_bn_samples(samples))
    mips = [(0.0, env)]
    current = env
    for roughness in roughness_levels[1:]:
        if current.shape[0] > MIN_MIP_SIZE:
            current = _downsample2(current)
        mips.append((float(roughness),
                     _convolve_level(current, float(roughness), u2)))
    return mips


@partial(jax.jit, static_argnames=())
def _convolve_level(env, roughness, u2):
    h, w = env.shape[0], env.shape[1]
    us = (jnp.arange(w) + 0.5) / w
    vs = (jnp.arange(h) + 0.5) / h
    uu, vv = jnp.meshgrid(us, vs)
    normal = latlong_uv_to_direction(jnp.stack([uu, vv], -1))  # [h, w, 3]
    alpha = jnp.maximum(roughness * roughness, 1e-3)

    def accumulate(carry, u):
        acc, wsum = carry
        # Sample the GGX lobe about the normal (wo == normal, split-sum).
        wo_local = jnp.asarray([0.0, 0.0, 1.0])
        half_local = ggx_vndf_sample_halfway(
            alpha, jnp.broadcast_to(wo_local, normal.shape),
            jnp.broadcast_to(u, normal.shape[:-1] + (2,)))
        wi_local = reflect(-jnp.broadcast_to(wo_local, normal.shape), half_local)
        wi = normalize(to_world(wi_local, normal))
        uv = direction_to_latlong_uv(wi)
        xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        weight = jnp.maximum(wi_local[..., 2], 0.0)[..., None]
        return (acc + env[yi, xi] * weight, wsum + weight), None

    (acc, wsum), _ = jax.lax.scan(accumulate,
                                  (jnp.zeros_like(env), jnp.zeros(env.shape[:2] + (1,))),
                                  u2)
    return acc / jnp.maximum(wsum, 1e-6)


def sample_ibl(mips, direction, roughness):
    """Fetch the prefiltered radiance along ``direction`` at ``roughness``
    with inter-level blending (DefaultShading.hlsl evaluate_IBL analogue)."""
    uv = direction_to_latlong_uv(direction)
    roughnesses = np.asarray([r for r, _ in mips], np.float32)
    level = jnp.interp(roughness, jnp.asarray(roughnesses),
                       jnp.arange(len(mips), dtype=jnp.float32))
    lo = jnp.clip(jnp.floor(level).astype(jnp.int32), 0, len(mips) - 1)
    frac = level - lo.astype(jnp.float32)

    def fetch(img, uv):
        h, w = img.shape[0], img.shape[1]
        xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return img[yi, xi]

    # Gather both adjacent levels for every lane and lerp (few levels, so a
    # masked sum over levels is cheapest on TPU).
    out_lo = jnp.zeros(direction.shape[:-1] + (3,))
    out_hi = jnp.zeros_like(out_lo)
    for i, (_, img) in enumerate(mips):
        f = fetch(img, uv)
        out_lo = jnp.where((lo == i)[..., None], f, out_lo)
        out_hi = jnp.where((jnp.clip(lo + 1, 0, len(mips) - 1) == i)[..., None],
                           f, out_hi)
    return out_lo * (1.0 - frac[..., None]) + out_hi * frac[..., None]
