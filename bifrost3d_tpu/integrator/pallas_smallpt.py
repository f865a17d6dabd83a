"""SmallPT as a single Pallas MEGAKERNEL — the whole path in one kernel.

The reference's SmallPT runs one thread per pixel with the entire
recursive path inline (apps/SmallPT/smallpt.h:65-118). The XLA wavefront
version (integrator/smallpt.py) round-trips the full lane state through
HBM every bounce across ~30 fused kernels per iteration, which makes it
launch/traffic-bound at ~14 ns/lane-bounce. This kernel is the TPU
megakernel: each grid step takes a [8, 128] block of pixels and runs ALL
``MAX_DEPTH`` bounces in-kernel — camera ray, 9-sphere intersection
(statically unrolled; per-hit attributes accumulated during the scan, so
there are no gathers), diffuse/mirror/glass shading, Russian roulette —
with the lane state living entirely in vector registers/VMEM. The scene's
sphere SoA arrives as SMEM scalars.

Sample chains follow integrator/smallpt.py exactly (same LCG consumption
order, same tent jitter, same RR rules); agreement is f32-noise-level
(op reassociation), gated by tests/test_smallpt.py.

Forward-only: autodiff paths keep the jnp wavefront. The SmallPT app and
bench dispatch here on TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bifrost3d_tpu.integrator.smallpt import (
    EPS,
    MAX_DEPTH,
    ORIGIN_OFFSET,
    RR_START_DEPTH,
    SMALLPT_CAM_DIRECTION,
    SMALLPT_CAM_ORIGIN,
)
from bifrost3d_tpu.scene.spheres import (
    BSDF_DIFFUSE,
    BSDF_GLASS,
    SphereScene,
)

LANES = (8, 128)          # one block = 1024 pixels as a full VPU tile
_LCG_MUL = np.uint32(1664525)
_LCG_INC = np.uint32(1013904223)
_U32_NORM = np.float32(1.0 / 4294967296.0)


# --- tiny vec3-of-tiles algebra -------------------------------------------

def _v3(x, y, z):
    return (x, y, z)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _normalize(a):
    inv = jax.lax.rsqrt(jnp.maximum(_dot(a, a), 1e-30))
    return _scale(a, inv)


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]),
            jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _u32_to_f32(x):
    """uint32 → float32 value (Mosaic has no direct u32→f32 cast): convert
    the low 31 bits via int32 and add the high bit's 2^31. At most 1 ULP
    from a direct rounded conversion."""
    lo = (x & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32).astype(jnp.float32)
    hi = (x >> jnp.uint32(31)).astype(jnp.int32).astype(jnp.float32)
    return lo + hi * np.float32(2147483648.0)


def _lcg(rng):
    rng = rng * _LCG_MUL + _LCG_INC
    return rng, _u32_to_f32(rng) * _U32_NORM


def _jenkins(x):
    x = x + (x << jnp.uint32(10))
    x = x ^ (x >> jnp.uint32(6))
    x = x + (x << jnp.uint32(3))
    x = x ^ (x >> jnp.uint32(11))
    x = x + (x << jnp.uint32(15))
    return x


def _reverse_bits(x):
    x = ((x & jnp.uint32(0x55555555)) << jnp.uint32(1)) \
        | ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << jnp.uint32(2)) \
        | ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) \
        | ((x >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) \
        | ((x >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF))
    return (x << jnp.uint32(16)) | (x >> jnp.uint32(16))


def _tent(u):
    r = 2.0 * u
    return jnp.where(r < 1.0, jnp.sqrt(r) - 1.0,
                     1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 0.0)))


def _make_kernel(n_spheres: int, width: int, height: int):
    cam_o = np.asarray(SMALLPT_CAM_ORIGIN, np.float32)
    cam_d = np.asarray(SMALLPT_CAM_DIRECTION, np.float32)
    cam_d = cam_d / np.linalg.norm(cam_d)
    cx = np.asarray([width * 0.5135 / height, 0.0, 0.0], np.float32)
    cy = np.cross(cx, cam_d)
    cy = cy / np.linalg.norm(cy) * 0.5135

    def kernel(acc_ref, sph_ref, bsdf_ref, x_ref, y_ref,
               r_out, g_out, b_out):
        accumulation = acc_ref[0]
        x = x_ref[...]
        y = y_ref[...]

        # --- spawn (identical chain to _initial_lane_state) --------------
        sx = accumulation % jnp.uint32(2)
        sy = (accumulation >> jnp.uint32(1)) % jnp.uint32(2)
        index = (y * jnp.uint32(2) + sy) * jnp.uint32(width * 2) \
            + x * jnp.uint32(2) + sx
        rng = _jenkins(index) ^ _reverse_bits(
            jnp.broadcast_to(accumulation, x.shape))
        rng, u1 = _lcg(rng)
        rng, u2 = _lcg(rng)
        def small_f32(a):    # u32 < 2^31: via int32 (no u32→f32 in Mosaic)
            return a.astype(jnp.int32).astype(jnp.float32)

        u = ((small_f32(sx) + 0.5 + _tent(u1)) / 2.0
             + small_f32(x)) / width
        v = ((small_f32(sy) + 0.5 + _tent(u2)) / 2.0
             + small_f32(y)) / height
        d = _add(_add(_scale((cx[0], cx[1], cx[2]), u - 0.5),
                      _scale((cy[0], cy[1], cy[2]), v - 0.5)),
                 (cam_d[0], cam_d[1], cam_d[2]))
        origin = _add((cam_o[0], cam_o[1], cam_o[2]), _scale(d, 140.0))
        direction = _normalize(d)

        one = jnp.ones_like(u)
        zero = jnp.zeros_like(u)
        throughput = (one, one, one)
        radiance = (zero, zero, zero)
        # The live mask rides the loop carry as f32 0/1 — Mosaic cannot
        # legalize vector<i1> loop carries.
        live_f = one

        def bounce(depth, carry):
            origin, direction, throughput, radiance, rng, live_f = carry
            live = live_f > 0.0

            # --- nearest sphere: unrolled scan, attributes by select ----
            best_t = jnp.full_like(u, np.float32(3.0e38))
            hit = live & False
            h_em = (zero, zero, zero)
            h_col = (zero, zero, zero)
            h_bsdf = jnp.zeros_like(x, dtype=jnp.int32)
            h_cen = (zero, zero, zero)
            for k in range(n_spheres):
                cen = (sph_ref[k, 0], sph_ref[k, 1], sph_ref[k, 2])
                rad_k = sph_ref[k, 3]
                op = _sub(cen, origin)
                b = _dot(op, direction)
                perp = _sub(op, _scale(direction, b))
                perp2 = _dot(perp, perp)
                d_perp = jnp.sqrt(jnp.maximum(perp2, 0.0))
                det = (rad_k - d_perp) * (rad_k + d_perp)
                sqrt_det = jnp.sqrt(jnp.maximum(det, 0.0))
                t_near = b - sqrt_det
                t_far = b + sqrt_det
                t = jnp.where(t_near > EPS, t_near,
                              jnp.where(t_far > EPS, t_far,
                                        np.float32(3.0e38)))
                t = jnp.where(det >= 0.0, t, np.float32(3.0e38))
                closer = t < best_t
                best_t = jnp.where(closer, t, best_t)
                hit = hit | (closer & (t < np.float32(1.0e38)))
                h_em = _where3(closer, (sph_ref[k, 4], sph_ref[k, 5],
                                        sph_ref[k, 6]), h_em)
                h_col = _where3(closer, (sph_ref[k, 7], sph_ref[k, 8],
                                         sph_ref[k, 9]), h_col)
                h_bsdf = jnp.where(closer, bsdf_ref[k], h_bsdf)
                h_cen = _where3(closer, cen, h_cen)

            live_hit = live & hit
            radiance = _add(radiance, _where3(
                live_hit, _mul(throughput, h_em), (zero, zero, zero)))

            t_safe = jnp.where(hit, best_t, 0.0)
            pos = _add(origin, _scale(direction, t_safe))
            norm = _normalize(_sub(pos, h_cen))
            n_dot_d = _dot(norm, direction)
            into_mask = n_dot_d < 0.0
            nl = _where3(into_mask, norm, _scale(norm, -one))

            f = h_col
            max_refl = jnp.maximum(jnp.maximum(f[0], f[1]), f[2])

            # Russian roulette. rr_on depends only on the (scalar) depth;
            # Mosaic cannot legalize selects with scalar conditions over
            # vector<i1> operands, so broadcast it to a vector mask via
            # f32 and use boolean algebra instead of jnp.where.
            rr_scalar = jnp.where(depth + 1 > RR_START_DEPTH,
                                  np.float32(1.0), np.float32(0.0))
            rr_on = (one * rr_scalar) > 0.5
            rng_rr, u_rr = _lcg(rng)
            rng = jnp.where(rr_on & live_hit, rng_rr, rng)
            survive = (~rr_on) | (u_rr < max_refl)
            inv_refl = 1.0 / jnp.maximum(max_refl, 1e-6)
            f = _where3(rr_on, _scale(f, inv_refl), f)
            live_hit = live_hit & survive

            is_diffuse = live_hit & (h_bsdf == BSDF_DIFFUSE)
            rng_d1, ud1 = _lcg(rng)
            rng_d2, ud2 = _lcg(rng_d1)
            r1 = 2.0 * np.float32(np.pi) * ud1
            r2s = jnp.sqrt(ud2)
            w = nl
            use_y = jnp.abs(w[0]) > 0.1
            up = _where3(use_y, (zero, one, zero), (one, zero, zero))
            ubasis = _normalize(_cross(up, w))
            vbasis = _cross(w, ubasis)
            dir_diffuse = _normalize(_add(
                _add(_scale(ubasis, jnp.cos(r1) * r2s),
                     _scale(vbasis, jnp.sin(r1) * r2s)),
                _scale(w, jnp.sqrt(jnp.maximum(1.0 - ud2, 0.0)))))

            dir_mirror = _sub(direction, _scale(norm, 2.0 * n_dot_d))
            refl_dir = dir_mirror

            is_glass = live_hit & (h_bsdf == BSDF_GLASS)
            into = _dot(norm, nl) > 0.0
            nc, nt = np.float32(1.0), np.float32(1.5)
            nnt = jnp.where(into, nc / nt, nt / nc)
            ddn = _dot(direction, nl)
            cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
            tir = cos2t < 0.0
            sqrt_cos2t = jnp.sqrt(jnp.maximum(cos2t, 0.0))
            tdir = _normalize(_sub(
                _scale(direction, nnt),
                _scale(norm, jnp.where(into, 1.0, -1.0)
                       * (ddn * nnt + sqrt_cos2t))))
            r0 = np.float32(((1.5 - 1.0) / (1.5 + 1.0)) ** 2)
            c = 1.0 - jnp.where(into, -ddn, _dot(tdir, norm))
            re = r0 + (1.0 - r0) * c * c * c * c * c
            tr = 1.0 - re
            p = 0.25 + 0.5 * re
            rng_g, u_g = _lcg(jnp.where(is_diffuse, rng_d2, rng))
            pick_refl = u_g < p
            glass_dir = _where3(tir, refl_dir,
                                _where3(pick_refl, refl_dir, tdir))
            glass_weight = jnp.where(
                tir, 1.0, jnp.where(pick_refl, re / p, tr / (1.0 - p)))

            rng = jnp.where(is_diffuse, rng_d2,
                            jnp.where(is_glass & ~tir, rng_g, rng))

            new_dir = _where3(is_diffuse, dir_diffuse,
                              _where3(is_glass, glass_dir, dir_mirror))
            weight = jnp.where(is_glass, glass_weight, 1.0)
            throughput = _where3(
                live_hit, _mul(throughput, _scale(f, weight)), throughput)
            live_hit = live_hit & (
                jnp.maximum(jnp.maximum(throughput[0], throughput[1]),
                            throughput[2]) > 0.0)

            leave = jnp.where(_dot(new_dir, norm) >= 0.0, 1.0, -1.0)
            new_origin = _add(pos, _scale(norm, leave * ORIGIN_OFFSET))
            return (new_origin, new_dir, throughput, radiance, rng,
                    jnp.where(live_hit, one, zero))

        carry = (origin, direction, throughput, radiance, rng, live_f)
        carry = jax.lax.fori_loop(0, MAX_DEPTH, bounce, carry)
        radiance = carry[3]
        r_out[...] = radiance[0]
        g_out[...] = radiance[1]
        b_out[...] = radiance[2]

    return kernel


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def render_smallpt_megakernel(scene: SphereScene, width: int, height: int,
                              accumulation,
                              interpret: bool = False) -> jnp.ndarray:
    """One progressive SmallPT frame, entire paths in one Pallas kernel →
    radiance [height, width, 3]. Same sample chains as
    ``render_smallpt_accumulation`` (f32-noise-level agreement)."""
    n = scene.position.shape[0]
    sph = jnp.concatenate([
        scene.position,                      # 0:3
        scene.radius[:, None],               # 3
        scene.emission,                      # 4:7
        scene.color,                         # 7:10
    ], axis=1).astype(jnp.float32)

    n_pixels = width * height
    per_block = LANES[0] * LANES[1]
    n_blocks = (n_pixels + per_block - 1) // per_block
    flat = jnp.arange(n_blocks * per_block, dtype=jnp.uint32)
    safe = jnp.minimum(flat, n_pixels - 1)
    xs = (safe % width).reshape(n_blocks * LANES[0], LANES[1])
    ys = (safe // width).reshape(n_blocks * LANES[0], LANES[1])

    block = pl.BlockSpec((LANES[0], LANES[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_blocks * LANES[0], LANES[1]),
                                      jnp.float32)] * 3
    r, g, b = pl.pallas_call(
        _make_kernel(n, width, height),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # accumulation
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere SoA
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bsdf ids
            block, block,                            # x, y
        ],
        out_specs=[block] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([accumulation], jnp.uint32), sph,
      scene.bsdf.astype(jnp.int32), xs, ys)

    img = jnp.stack([r.reshape(-1)[:n_pixels],
                     g.reshape(-1)[:n_pixels],
                     b.reshape(-1)[:n_pixels]], axis=-1)
    return img.reshape(height, width, 3)
