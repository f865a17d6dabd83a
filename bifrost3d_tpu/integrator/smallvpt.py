"""smallvpt: the volumetric SmallPT variant (homogeneous scattering medium).

Counterpart of ``apps/SmallPT/smallvpt.h`` (SURVEY.md §2.7): the Cornell
sphere scene wrapped in a big homogeneous medium sphere (σ_t = 0.01),
exponential free-flight distance sampling, absorption Russian roulette on
the single-scattering albedo, and Henyey-Greenstein phase sampling with
g = -0.5 — re-designed as a wavefront like the surface-only SmallPT.

Estimator parity notes (same spirit as integrator/smallpt.py):
- The reference's recursive `integrate_radiance` becomes masked wavefront
  lanes; depth counts interactions (surface AND scattering events).
- Glass uses pure Fresnel Russian roulette (smallvpt.h:150-158 — unlike
  smallpt there's no 0.25+0.5·Re reweighting here).
- The medium RR deliberately does NOT divide by the survival probability
  (reference behavior: throughput *= albedo, survive with P=avg(albedo)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.integrator.smallpt import (
    EPS,
    ORIGIN_OFFSET,
    SMALLPT_CAM_DIRECTION,
    SMALLPT_CAM_ORIGIN,
    _diffuse_dir,
    _tent_jitter,
)
from bifrost3d_tpu.math.vec import cross, dot, normalize, reflect, to_world
from bifrost3d_tpu.sampling.distributions import henyey_greenstein_sample
from bifrost3d_tpu.sampling.hashes import jenkins_hash, lcg_next, reverse_bits
from bifrost3d_tpu.scene.spheres import SphereScene, intersect_spheres, smallpt_scene

MEDIUM_CENTER = np.asarray([50.0, 50.0, 80.0], np.float32)
MEDIUM_RADIUS = 300.0
SIGMA_T = 0.01
MEDIUM_ALBEDO = np.asarray([0.9, 0.6, 0.3], np.float32)
HG_G = -0.5
MAX_INTERACTIONS = 32


def _medium_near_t(origin, direction):
    """Entry distance into the medium sphere (0 when inside), inf on miss
    (smallvpt.h Sphere::intersect tin/tout semantics)."""
    op = MEDIUM_CENTER - origin
    b = dot(op, direction)
    det = MEDIUM_RADIUS * MEDIUM_RADIUS - (dot(op, op) - b * b)
    sqrt_det = jnp.sqrt(jnp.maximum(det, 0.0))
    t_in = jnp.maximum(b - sqrt_det, 0.0)
    hits = (det >= 0.0) & (b + sqrt_det > 0.0)
    return jnp.where(hits, t_in, jnp.inf)


def _interaction(scene: SphereScene, state):
    origin, direction, throughput, radiance, rng, live, depth = state

    # Free-flight sampling through the medium (smallvpt.h:79-83).
    t_medium = _medium_near_t(origin, direction)
    rng_m, u_m = lcg_next(rng)
    rng = jnp.where(live & jnp.isfinite(t_medium), rng_m, rng)
    flight = -jnp.log(jnp.maximum(1.0 - u_m, 1e-12)) / SIGMA_T
    scatter_t = jnp.where(jnp.isfinite(t_medium), t_medium + flight, jnp.inf)

    t_surf, idx, hit_surf = intersect_spheres(scene, origin, direction, eps=EPS)
    idx = jnp.maximum(idx, 0)

    scatters = live & (scatter_t <= t_surf)
    hits = live & ~scatters & hit_surf
    live = live & (scatters | hits)

    # --- scattering event (smallvpt.h:92-105) ---
    rng_rr, u_rr = lcg_next(rng)
    rng_h1, u_h1 = lcg_next(rng_rr)
    rng_h2, u_h2 = lcg_next(rng_h1)
    absorb = u_rr >= jnp.mean(MEDIUM_ALBEDO)
    hg_local, _ = henyey_greenstein_sample(
        HG_G, jnp.stack([u_h1, u_h2], axis=-1))
    scatter_dir = normalize(to_world(hg_local, direction))
    scatter_pos = origin + direction * scatter_t[..., None]

    # --- surface interaction (smallvpt.h:108-160) ---
    pos = origin + direction * t_surf[..., None]
    norm = normalize(pos - scene.position[idx])
    nl = jnp.where(dot(norm, direction)[..., None] < 0.0, norm, -norm)
    albedo = scene.color[idx]
    emission = scene.emission[idx]
    radiance = radiance + jnp.where(hits[..., None], throughput * emission, 0.0)

    # Surface RR after 5 interactions.
    rr_on = depth + 1 > 5
    rng_s, u_s = lcg_next(rng)
    max_albedo = jnp.max(albedo, axis=-1)
    survive = jnp.where(rr_on, u_s < max_albedo, True)
    albedo = jnp.where(rr_on[..., None] if jnp.ndim(rr_on) else rr_on,
                       albedo / jnp.maximum(max_albedo, 1e-6)[..., None], albedo)

    bsdf = scene.bsdf[idx]
    is_dif = hits & (bsdf == 0)
    is_gls = hits & (bsdf == 2)

    rng_d1, u1 = lcg_next(jnp.where(rr_on, rng_s, rng))
    rng_d2, u2 = lcg_next(rng_d1)
    dir_dif = _diffuse_dir(nl, u1, u2)
    dir_mir = reflect(direction, norm)

    into = dot(norm, nl) > 0.0
    rel_ior = jnp.where(into, 1.0 / 1.5, 1.5)
    ddn = dot(direction, nl)
    cos2t = 1.0 - rel_ior * rel_ior * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    tdir = normalize(direction * rel_ior[..., None]
                     - norm * (jnp.where(into, 1.0, -1.0)
                               * (ddn * rel_ior + jnp.sqrt(jnp.maximum(cos2t, 0.0))))[..., None])
    spec = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
    cos_theta = jnp.where(into, -ddn, dot(norm, tdir))
    re = spec + (1.0 - spec) * (1.0 - cos_theta) ** 5
    rng_g, u_g = lcg_next(jnp.where(is_dif, rng_d2, jnp.where(rr_on, rng_s, rng)))
    pick_refl = u_g < re
    dir_gls = jnp.where(tir[..., None], dir_mir,
                        jnp.where(pick_refl[..., None], dir_mir, tdir))
    # Glass: reflection keeps throughput, refraction picks up albedo
    # (smallvpt.h:156-159); TIR consumes no sample.
    gls_weight = jnp.where((tir | pick_refl)[..., None], jnp.ones_like(albedo), albedo)

    # Advance RNG per lane by actual consumption.
    rng_after_rr = jnp.where(rr_on & hits, rng_s, rng)
    rng = jnp.where(scatters, rng_h2,
                    jnp.where(is_dif, rng_d2,
                              jnp.where(is_gls & ~tir, rng_g, rng_after_rr)))

    surf_dir = jnp.where(is_dif[..., None], dir_dif,
                         jnp.where(is_gls[..., None], dir_gls, dir_mir))
    # Diffuse and mirror scale by albedo; glass by its Fresnel-picked weight.
    surf_weight = jnp.where(is_gls[..., None], gls_weight, albedo)

    new_origin = jnp.where(
        scatters[..., None], scatter_pos,
        pos + norm * jnp.sign(dot(surf_dir, norm))[..., None] * ORIGIN_OFFSET)
    new_dir = jnp.where(scatters[..., None], scatter_dir, surf_dir)
    new_throughput = jnp.where(
        scatters[..., None], throughput * MEDIUM_ALBEDO,
        jnp.where(hits[..., None], throughput * surf_weight, throughput))

    live = live & jnp.where(scatters, ~absorb, survive)
    live = live & (jnp.max(new_throughput, axis=-1) > 1e-6)
    depth = jnp.where(scatters | hits, depth + 1, depth)
    return (new_origin, new_dir, new_throughput, radiance, rng, live, depth)


@partial(jax.jit, static_argnames=("width", "height"))
def render_smallvpt_accumulation(scene: SphereScene, width: int, height: int,
                                 accumulation) -> jnp.ndarray:
    """One progressive volumetric sample per pixel → [height, width, 3]."""
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    cam_o = jnp.asarray(SMALLPT_CAM_ORIGIN, jnp.float32)
    cam_d = normalize(jnp.asarray(SMALLPT_CAM_DIRECTION, jnp.float32))
    cx = jnp.asarray([width * 0.5135 / height, 0.0, 0.0], jnp.float32)
    cy = normalize(cross(cx, cam_d)) * 0.5135

    x = jnp.arange(width, dtype=jnp.uint32)[None, :]
    y = jnp.arange(height, dtype=jnp.uint32)[:, None]
    sx = accumulation % 2
    sy = (accumulation >> jnp.uint32(1)) % 2
    index = (y * 2 + sy) * (width * 2) + x * 2 + sx
    rng = jenkins_hash(index) ^ reverse_bits(accumulation)
    rng, u1 = lcg_next(rng)
    rng, u2 = lcg_next(rng)
    dx = _tent_jitter(u1)
    dy = _tent_jitter(u2)
    d = (cx * (((sx.astype(jnp.float32) + 0.5 + dx) / 2.0 + x.astype(jnp.float32)) / width - 0.5)[..., None]
         + cy * (((sy.astype(jnp.float32) + 0.5 + dy) / 2.0 + y.astype(jnp.float32)) / height - 0.5)[..., None]
         + cam_d)
    origin = cam_o + d * 140.0
    direction = normalize(d)

    state = (origin, direction,
             jnp.ones_like(origin), jnp.zeros_like(origin),
             rng, jnp.isfinite(origin[..., 0]),
             jnp.zeros(origin.shape[:-1], jnp.uint32))
    state = jax.lax.fori_loop(
        0, MAX_INTERACTIONS, lambda i, s: _interaction(scene, s), state)
    return state[3]


def render_smallvpt(scene: SphereScene, width: int, height: int,
                    accumulations: int) -> jnp.ndarray:
    buffer = jnp.zeros((height, width, 3), jnp.float32)
    for n in range(1, accumulations + 1):
        frame = render_smallvpt_accumulation(scene, width, height, n)
        buffer = buffer + (frame - buffer) / n
    return buffer
