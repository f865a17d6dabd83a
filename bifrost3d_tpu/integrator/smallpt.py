"""SmallPT: wavefront sphere path tracer (diffuse / mirror / glass).

TPU-native re-design of the reference's CPU SmallPT
(``apps/SmallPT/smallpt.h``, SURVEY.md §2.7, §3.4): the recursive per-pixel
``radiance()`` becomes a fused per-bounce loop over the whole pixel
wavefront — every lane advances one bounce per iteration of a
``lax.fori_loop`` with masks for terminated lanes, which is exactly the
megakernel→wavefront mapping of SURVEY.md §2.8.

Estimator parity notes vs the reference:
- Same LCG RNG (multiplier 1664525), same per-pixel seed
  ``jenkins_hash(stratified_index) ^ reverse_bits(accumulation)``
  (smallpt.h:132-138), same 2x2 stratification and tent-filter jitter.
- Same Russian roulette after bounce 5 on max reflectance, hard cap 20.
- One deviation: the reference *splits* glass paths into both reflection
  and refraction for depth <= 2 (smallpt.h:113-117). A wavefront cannot
  fork lanes, so glass always uses the Fresnel Russian roulette
  (P = 0.25 + 0.5·Re) at every depth — the identical estimator the
  reference itself uses beyond depth 2, unbiased with the same expectation,
  slightly higher variance on glass at low sample counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bifrost3d_tpu.math.vec import cross, dot, normalize, reflect
from bifrost3d_tpu.sampling.hashes import jenkins_hash, lcg_next, reverse_bits
from bifrost3d_tpu.scene.spheres import (
    BSDF_DIFFUSE,
    BSDF_GLASS,
    BSDF_SPECULAR,
    SphereScene,
    intersect_spheres,
)

SMALLPT_CAM_ORIGIN = (50.0, 52.0, 295.6)
SMALLPT_CAM_DIRECTION = (0.0, -0.042612, -1.0)
MAX_DEPTH = 20
RR_START_DEPTH = 5
GLASS_RR_START_DEPTH = 0  # reference: 2 (splits before that; see docstring)
EPS = 1e-2  # t-min epsilon, scaled up from the reference's 1e-4 for float32
# Ray-origin offset along the geometric normal (the float32 stand-in for the
# reference's RT-Gems integer offset, Utils.h:372-397): hit positions on the
# 1e5-radius wall spheres carry ~0.02 absolute error in float32, so new rays
# start half a tenth of a scene unit off the surface to avoid re-hits.
ORIGIN_OFFSET = 0.05


def _tent_jitter(u):
    """Tent-filter reconstruction jitter in [-1, 1] (smallpt.h:133-135)."""
    r = 2.0 * u
    return jnp.where(r < 1.0, jnp.sqrt(r) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 0.0)))


def _diffuse_dir(nl, u1, u2):
    """Cosine-hemisphere direction about nl, smallpt's tangent construction."""
    r1 = 2.0 * jnp.pi * u1
    r2 = u2
    r2s = jnp.sqrt(r2)
    w = nl
    up = jnp.where(jnp.abs(w[..., 0:1]) > 0.1,
                   jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                   jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    u = normalize(cross(up, w))
    v = cross(w, u)
    return normalize(u * (jnp.cos(r1) * r2s)[..., None]
                     + v * (jnp.sin(r1) * r2s)[..., None]
                     + w * jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[..., None])


def _bounce(scene: SphereScene, state, depth):
    """One wavefront bounce. state = (o, d, throughput, radiance, rng, active).

    ``depth`` may be a traced scalar (fori_loop counter); the RR activation
    becomes a mask instead of the reference's static branch.
    """
    origin, direction, throughput, radiance, rng, active = state

    t, idx, hit = intersect_spheres(scene, origin, direction, eps=EPS)
    idx = jnp.maximum(idx, 0)
    emission = scene.emission[idx]
    color = scene.color[idx]
    bsdf = scene.bsdf[idx]

    live = active & hit
    radiance = radiance + jnp.where(live[..., None], throughput * emission, 0.0)

    # Miss lanes carry t = inf; 0*inf would poison forward values and the
    # backward pass w.r.t. sphere positions (geometry gradients), so pin
    # dead lanes to their origins.
    t_safe = jnp.where(hit, t, 0.0)
    pos = origin + direction * t_safe[..., None]
    norm = normalize(pos - scene.position[idx])
    n_dot_d = dot(norm, direction)
    nl = jnp.where(n_dot_d[..., None] < 0.0, norm, -norm)

    f = color
    max_refl = jnp.max(f, axis=-1)

    # Russian roulette after RR_START_DEPTH bounces (smallpt.h:79-81).
    # depth counts completed bounces; the reference increments before
    # testing, so RR applies when (depth + 1) > 5.
    # rr_on is a scalar under the dense fori loop and a per-lane array in
    # the pooled wavefront (lanes spawn at different iterations).
    rr_on = jnp.asarray(depth + 1 > RR_START_DEPTH)
    rng_rr, u_rr = lcg_next(rng)
    rng = jnp.where(rr_on & live, rng_rr, rng)
    survive = jnp.where(rr_on, u_rr < max_refl, True)
    f = jnp.where(rr_on[..., None],
                  f / jnp.maximum(max_refl, 1e-6)[..., None], f)
    live = live & survive

    # --- Diffuse: cosine hemisphere sample (2 rng draws) ---
    is_diffuse = live & (bsdf == BSDF_DIFFUSE)
    rng_d1, u1 = lcg_next(rng)
    rng_d2, u2 = lcg_next(rng_d1)
    dir_diffuse = _diffuse_dir(nl, u1, u2)

    # --- Mirror ---
    dir_mirror = reflect(direction, nl)

    # --- Glass: Fresnel Russian roulette between reflect and refract ---
    is_glass = live & (bsdf == BSDF_GLASS)
    refl_dir = reflect(direction, norm)
    into = dot(norm, nl) > 0.0
    nc, nt = 1.0, 1.5
    nnt = jnp.where(into, nc / nt, nt / nc)
    ddn = dot(direction, nl)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    # Double-where sqrt: TIR lanes (cos2t < 0) must not emit NaN
    # cotangents into ddn when differentiating w.r.t. geometry.
    cos2t_ok = cos2t > 0.0
    sqrt_cos2t = jnp.where(
        cos2t_ok, jnp.sqrt(jnp.where(cos2t_ok, cos2t, 1.0)), 0.0)
    tdir = normalize(
        direction * nnt[..., None]
        - norm * (jnp.where(into, 1.0, -1.0)
                  * (ddn * nnt + sqrt_cos2t))[..., None])
    r0 = ((nt - nc) / (nt + nc)) ** 2
    c = 1.0 - jnp.where(into, -ddn, dot(tdir, norm))
    re = r0 + (1.0 - r0) * c ** 5
    tr = 1.0 - re
    p = 0.25 + 0.5 * re
    # Glass consumes one rng draw when not TIR.
    rng_g, u_g = lcg_next(jnp.where(is_diffuse, rng_d2, rng))
    pick_refl = u_g < p
    glass_dir = jnp.where(tir[..., None], refl_dir,
                          jnp.where(pick_refl[..., None], refl_dir, tdir))
    glass_weight = jnp.where(tir, 1.0, jnp.where(pick_refl, re / p, tr / (1.0 - p)))

    # Advance per-lane RNG state by what each lane consumed.
    rng = jnp.where(is_diffuse, rng_d2, jnp.where(is_glass & ~tir, rng_g, rng))

    new_dir = jnp.where(is_diffuse[..., None], dir_diffuse,
                        jnp.where(is_glass[..., None], glass_dir, dir_mirror))
    weight = jnp.where(is_glass, glass_weight, 1.0)
    throughput = jnp.where(live[..., None], throughput * f * weight[..., None],
                           throughput)

    # Terminate lanes whose throughput died.
    live = live & (jnp.max(throughput, axis=-1) > 0.0)

    # Offset the new origin off the surface, on whichever side the new
    # direction leaves through (refractions go through the surface).
    leave_side = jnp.sign(dot(new_dir, norm, keepdims=True))
    new_origin = pos + norm * leave_side * ORIGIN_OFFSET
    return (new_origin, new_dir, throughput, radiance, rng, live)


def smallpt_camera_ray(u, v, width: int, height: int):
    """Continuous-image-coordinate camera ray (smallpt.h:122-141).

    ``u``/``v`` in [0, 1) (u right, v up, any broadcastable shape) →
    (origin [..., 3], unit direction [..., 3]). All rays pass through the
    camera pinhole; origins sit 140 unnormalized-direction units down the
    ray like the reference. Differentiable in (u, v) — the edge-sampling
    geometry gradients (diff/edge_grad.py) exploit this.
    """
    cam_o = jnp.asarray(SMALLPT_CAM_ORIGIN, jnp.float32)
    cam_d = normalize(jnp.asarray(SMALLPT_CAM_DIRECTION, jnp.float32))
    cx = jnp.asarray([width * 0.5135 / height, 0.0, 0.0], jnp.float32)
    cy = normalize(cross(cx, cam_d)) * 0.5135
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    d = (cx * (u - 0.5)[..., None] + cy * (v - 0.5)[..., None] + cam_d)
    return cam_o + d * 140.0, normalize(d)


def _initial_lane_state(x, y, width: int, height: int, accumulation):
    """Per-pixel initial bounce state (camera ray, RNG chain seeded by
    jenkins(pixel-subsample index) ^ reverse_bits(frame), smallpt.h:132-138).
    Shared by the dense grid renderer and the pooled wavefront so both walk
    IDENTICAL per-pixel sample chains."""
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    sx = accumulation % 2
    sy = (accumulation >> jnp.uint32(1)) % 2
    index = (y * 2 + sy) * (width * 2) + x * 2 + sx
    rng = jenkins_hash(index) ^ reverse_bits(accumulation)

    rng, u1 = lcg_next(rng)
    rng, u2 = lcg_next(rng)
    dx = _tent_jitter(u1)
    dy = _tent_jitter(u2)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    sxf = sx.astype(jnp.float32)
    syf = sy.astype(jnp.float32)
    u = (((sxf + 0.5 + dx) / 2.0 + xf) / width
         + 0.0)  # continuous image coordinate in [0, 1)
    v = ((syf + 0.5 + dy) / 2.0 + yf) / height
    origin, direction = smallpt_camera_ray(u, v, width, height)
    return (
        origin, direction,
        jnp.ones_like(origin),
        jnp.zeros_like(origin),
        rng,
        jnp.isfinite(origin[..., 0]),
    )


def render_smallpt_pixels(scene: SphereScene, x, y, width: int, height: int,
                          accumulation) -> jnp.ndarray:
    """Render one progressive sample for pixel coords ``x``/``y`` (uint32,
    any broadcastable shape) → radiance [..., 3].

    This is the shardable core: pixel indices are data, so a device mesh can
    shard rows/tiles over chips while the scene stays replicated
    (SURVEY.md §2.8 ray/tile data parallelism).
    """
    state = _initial_lane_state(x, y, width, height, accumulation)
    # Bounce loop as lax.fori_loop: the body compiles once (fast compile),
    # masks handle early termination — the wavefront analogue of the
    # reference's per-thread do/while (SimpleRGPs.cu:133-137).
    state = jax.lax.fori_loop(
        0, MAX_DEPTH, lambda d, s: _bounce(scene, s, d), state)
    return state[3]


def render_smallpt_pooled_counted(scene: SphereScene, width: int,
                                  height: int, accumulation,
                                  pool_size: int = 131072):
    """Pooled compacting wavefront over the SmallPT estimator →
    (radiance [height·width, 3], live-ray tally [] uint32).

    Identical per-pixel sample chains to the dense renderer (same seeding,
    same RNG consumption — parity-tested), but terminated lanes are refilled
    with fresh camera rays immediately, so no lane idles through the dense
    version's fixed MAX_DEPTH iterations (~6.5 of 20 live on the Cornell
    scene — a ~3× wall-clock win at the same estimator).
    """
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    n_pixels = width * height
    r = min(pool_size, n_pixels)

    def spawn(pixel_idx):
        valid = pixel_idx < n_pixels
        safe = jnp.minimum(pixel_idx, n_pixels - 1)
        x = (safe % width).astype(jnp.uint32)
        y = (safe // width).astype(jnp.uint32)
        o, d, thr, rad, rng, alive = _initial_lane_state(
            x, y, width, height, accumulation)
        return (o, d, thr, rad, rng, alive & valid)

    pixel_idx0 = jnp.arange(r, dtype=jnp.int32)
    state0 = spawn(pixel_idx0)
    depth0 = jnp.zeros(r, jnp.int32)
    accum0 = jnp.zeros((n_pixels, 3), jnp.float32)
    max_iters = (n_pixels // r + 1) * MAX_DEPTH * 2 + 64

    def cond(carry):
        state, depth, pixel_idx, accum, next_pixel, it, rays = carry
        return (jnp.any(state[5]) | (next_pixel < n_pixels)) \
            & (it < max_iters)

    def body(carry):
        state, depth, pixel_idx, accum, next_pixel, it, rays = carry
        rays = rays + jnp.sum(state[5].astype(jnp.uint32))
        state = _bounce(scene, state, depth)
        depth = depth + 1
        o, d, thr, rad, rng, live = state
        live = live & (depth < MAX_DEPTH)   # the dense loop's hard cap
        valid = pixel_idx < n_pixels
        done = valid & ~live

        accum = accum.at[jnp.clip(pixel_idx, 0, n_pixels - 1)].add(
            jnp.where(done[..., None], rad, 0.0))

        slot = jnp.cumsum(done.astype(jnp.int32)) - 1
        new_idx = next_pixel + slot
        refill = done & (new_idx < n_pixels)
        pixel_idx = jnp.where(refill, new_idx,
                              jnp.where(done, n_pixels, pixel_idx))
        next_pixel = jnp.minimum(
            next_pixel + jnp.sum(done.astype(jnp.int32)), n_pixels)

        fresh = spawn(pixel_idx)
        state = tuple(
            jnp.where(refill.reshape(refill.shape + (1,) * (f.ndim - 1)),
                      f, s)
            for f, s in zip(fresh, (o, d, thr, rad, rng, live)))
        depth = jnp.where(refill, 0, depth)
        return state, depth, pixel_idx, accum, next_pixel, it + 1, rays

    _, _, _, accum, _, _, rays = jax.lax.while_loop(
        cond, body,
        (state0, depth0, pixel_idx0, accum0, jnp.int32(r), jnp.int32(0),
         jnp.uint32(0)))
    return accum, rays


@partial(jax.jit, static_argnames=("width", "height", "pool_size"))
def render_smallpt_pooled(scene: SphereScene, width: int, height: int,
                          accumulation, pool_size: int = 131072):
    """One progressive SmallPT frame through the pooled wavefront →
    radiance [height, width, 3] (bit-identical chains to
    :func:`render_smallpt_accumulation`)."""
    accum, _ = render_smallpt_pooled_counted(
        scene, width, height, accumulation, pool_size)
    return accum.reshape(height, width, 3)


@partial(jax.jit, static_argnames=("width", "height"))
def render_smallpt_accumulation(scene: SphereScene, width: int, height: int,
                                accumulation) -> jnp.ndarray:
    """Render one progressive sample per pixel → radiance [height, width, 3].

    ``accumulation`` is the 1-based progressive frame counter (the reference
    pre-increments before rendering, smallpt.h:125). Row 0 is the bottom row
    (smallpt's backbuffer convention).
    """
    x = jnp.broadcast_to(jnp.arange(width, dtype=jnp.uint32)[None, :], (height, width))
    y = jnp.broadcast_to(jnp.arange(height, dtype=jnp.uint32)[:, None], (height, width))
    return render_smallpt_pixels(scene, x, y, width, height, accumulation)


def render_smallpt(scene: SphereScene, width: int, height: int,
                   accumulations: int) -> jnp.ndarray:
    """Progressive render: average of ``accumulations`` frames
    (lerp with 1/n like smallpt.h:144, which equals the running mean)."""
    buffer = jnp.zeros((height, width, 3), jnp.float32)
    for n in range(1, accumulations + 1):
        frame = render_smallpt_accumulation(scene, width, height, n)
        buffer = buffer + (frame - buffer) / n
    return buffer
