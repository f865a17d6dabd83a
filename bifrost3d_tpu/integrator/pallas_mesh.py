"""The mesh path tracer as a single Pallas MEGAKERNEL (small scenes).

The reference renders one GPU thread per pixel with the whole path inline
(Shading/SimpleRGPs.cu:112-140 + MonteCarlo.cu:129-233). The XLA wavefront
(integrator/path_tracer.py) is the general/differentiable product path, but
its step body dispatches ~86 XLA kernels per pool iteration and is
launch-bound on TPU (BASELINE.md r3). This kernel is the TPU megakernel for
scenes whose geometry fits VMEM: each grid step takes an [8, 128] block of
pixels and runs the ENTIRE estimator in-kernel — dense Möller-Trumbore
trace over the VMEM-resident triangle table, octahedral-decoded attribute
fetch via one-hot MXU contraction, DefaultShading (EON diffuse + GGX
bounded-VNDF specular with rho-table energy compensation), RIS(3) NEE with
toroidally-shifted candidates, balance-heuristic MIS, shadow trace, and
Owen-scrambled Sobol RNG — with all lane state living in vector registers.

Tile geometry: per-lane scalars are (8, 128) f32/u32 tiles; vectors are
tuples of three tiles. The trace and the table lookups run per sublane row
(rays as a (1, 128) lane row against triangles on the sublane axis), which
keeps every contraction 2D:

- trace: (T, 1) triangle components broadcast against (1, 128) rays
  → dense (T, 128) VPU math, running min over the sublane axis;
- attribute fetch: (A, T) table @ (T, 128) one-hot → (A, 128) on the MXU;
- rho lookups: (32, 32) table @ (32, 128) hat-weight columns → bilinear
  interpolation as one small matmul (the r3 one-hot-MXU trick in-kernel).

Estimator parity: the sample chains follow path_tracer.render_sample
exactly (same Sobol dimension scheme Types.h:422-427, same RIS reservoir,
same clamps); agreement is f32-noise-level (op reassociation and a
≤1-ULP-identical uint→float conversion can flip individual stochastic
decisions), gated statistically by tests/test_pallas_mesh.py.

Feature matrix (``megakernel_ineligibility_reasons`` is the source of
truth; "yes" = in-kernel with a parity test):

  triangles            yes, ≤ HIER_MAX_TRIS: dense VMEM trace up to
                       MAX_TRIS, then the cluster-BVH hier trace (scalar
                       SMEM stack walk per (8,128) pixel tile, leaf
                       clusters DMA'd HBM→VMEM, attrs merged in-walk via
                       one-hot MXU contraction) — one kernel family
                       across all sizes (Renderer.cpp:161-182 parity)
  lights               yes: sphere, directional, spot (disk/cone + MIS)
  environment          yes: latlong map ≤ MAX_ENV_TEXELS, bilinear eval +
                       per-pixel-pdf MIS + presampled-pool NEE (a pool is
                       REQUIRED — CDF-search NEE stays on the wavefront)
  textures             yes: NEAREST-filtered tint-roughness/coverage
                       banks ≤ MAX_TEX_TEXELS (one-hot MXU fetch);
                       filtered/metallic textures → wavefront
  cutout/coverage      yes: stochastic transparency + coverage-aware
                       shadow march
  shading models       Default (incl. COAT) and Diffuse; Transmissive →
                       wavefront
  per-vertex tint      no → wavefront
  path regularization  no → wavefront
  autodiff             no — gradients keep render_sample

Everything outside this matrix renders through the XLA wavefront
(render_sample_fast logs the first disqualifying feature at INFO).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bifrost3d_tpu.integrator.path_tracer import (
    RenderSettings,
    _reverse_halton_offsets,
)
from bifrost3d_tpu.lights.types import (LIGHT_DIRECTIONAL, LIGHT_SPHERE,
                                        LIGHT_SPOT)
from bifrost3d_tpu.scene.render_scene import RenderScene

LANES = (8, 128)
# Dense-trace triangle budget: each live lane-iteration streams the whole
# table (53 VPU flops/test at the measured 45G tests/s ceiling), so the
# megakernel's dense trace beats the pooled wavefront's per-iteration fixed
# costs up to ~1k triangles; beyond that the wavefront's hierarchical BVH
# kernel wins. 1024 admits the tessellated-sphere scenes (Sphere.h: 962).
MAX_TRIS = 1024
MAX_MATERIALS = 32
MAX_LIGHTS = 8
# Texture scope: total level-0 texel budget across the bank. Fetches run as
# one-hot MXU contractions over a flattened (8, N) VMEM table, so the cost
# scales with N — tiny procedural textures (checkers, cutout grids) are the
# target; big image textures stay on the wavefront.
MAX_TEX_TEXELS = 4096
_BIG = 3.0e38
PI = float(np.pi)
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
MIN_ALPHA = 1e-4
_MIN_COS = 1e-6

# Sobol direction numbers (sampling/sobol.py _sobol_direction_numbers) as
# compile-time python ints.
from bifrost3d_tpu.sampling.sobol import _DIRECTIONS as _SOBOL_DIRS  # noqa: E402

_RIS_OFFSETS = _reverse_halton_offsets(8)

# EON constants (bsdf/oren_nayar.py).
_C1_FON = 0.5 - 2.0 / (3.0 * PI)
_C2_FON = 2.0 / 3.0 - 28.0 / (15.0 * PI)

# RT-Gems ray offset constants (math/ray_offset.py).
_RO_ORIGIN = 1.0 / 32.0
_RO_FLOAT_SCALE = 1.0 / 65536.0
_RO_INT_SCALE = 256.0


# ---------------------------------------------------------------------------
# Tile algebra (vec3 = tuple of three (8,128) tiles)
# ---------------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


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


def _max3(a):
    return jnp.maximum(jnp.maximum(a[0], a[1]), a[2])


def _lerp(a, b, t):
    return a + (b - a) * t


def _gsafe(x, floor=0.0):
    return jnp.maximum(x, max(floor, 1e-12))


def _onb(n):
    """Duff et al. branch-free tangent basis (math/vec.py orthonormal_basis)."""
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    t = (1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0])
    bt = (b, sign + n[1] * n[1] * a, -n[1])
    return t, bt


def _to_local(v, n):
    t, b = _onb(n)
    return (_dot(v, t), _dot(v, b), _dot(v, n))


def _to_world(v, n):
    t, b = _onb(n)
    return (v[0] * t[0] + v[1] * b[0] + v[2] * n[0],
            v[0] * t[1] + v[1] * b[1] + v[2] * n[1],
            v[0] * t[2] + v[1] * b[2] + v[2] * n[2])


def _reflect(d, n):
    k = 2.0 * _dot(d, n)
    return (d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2])


def _offset_ray_origin(p, n):
    """RT-Gems integer offset (math/ray_offset.py) in tile form."""
    out = []
    for c in range(3):
        of_i = (_RO_INT_SCALE * n[c]).astype(jnp.int32)
        p_int = pltpu.bitcast(p[c], jnp.int32)
        p_adj = p_int + jnp.where(p[c] < 0.0, -of_i, of_i)
        p_i = pltpu.bitcast(p_adj, jnp.float32)
        out.append(jnp.where(jnp.abs(p[c]) < _RO_ORIGIN,
                             p[c] + _RO_FLOAT_SCALE * n[c], p_i))
    return tuple(out)


# ---------------------------------------------------------------------------
# RNG (sampling/hashes.py + sobol.py, u32 tile form)
# ---------------------------------------------------------------------------

def _u2f(x):
    """uint32 → f32 in [0,1): split into exact 23-bit + 9-bit parts so the
    single rounding of their sum equals the direct u32→f32 conversion
    (Mosaic has no u32→f32 cast)."""
    hi = (x >> jnp.uint32(9)).astype(jnp.int32).astype(jnp.float32)
    lo = (x & jnp.uint32(0x1FF)).astype(jnp.int32).astype(jnp.float32)
    return (hi * 512.0 + lo) * np.float32(2.0 ** -32)


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


def _cessen_owen_hash(x, seed):
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> jnp.uint32(16)) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


_PCG_MUL = np.uint32(1664525)
_PCG_INC = np.uint32(1013904223)


def _pcg2d_x(x, y):
    x = x * _PCG_MUL + _PCG_INC
    y = y * _PCG_MUL + _PCG_INC
    x = x + y * _PCG_MUL
    y = y + x * _PCG_MUL
    x = x ^ (x >> jnp.uint32(16))
    y = y ^ (y >> jnp.uint32(16))
    x = x + y * _PCG_MUL
    return x ^ (x >> jnp.uint32(16))


def _nested_uniform_scramble(x, seed):
    return _reverse_bits(_cessen_owen_hash(_reverse_bits(x), seed))


def _path_rng_4d(accumulation, pixel_hash, dimension):
    """path_rng_4d (sampling/sobol.py) in tile form → 4 f32 tiles."""
    seed = _pcg2d_x(pixel_hash, dimension)
    index = _nested_uniform_scramble(
        jnp.broadcast_to(accumulation, pixel_hash.shape), seed)
    res = [jnp.zeros_like(index) for _ in range(4)]
    for b in range(32):
        bit = (index >> jnp.uint32(b)) & jnp.uint32(1)
        for d in range(4):
            res[d] = res[d] ^ (bit * np.uint32(_SOBOL_DIRS[d, b]))
    out = []
    for d in range(4):
        dseed = seed ^ (jnp.uint32(d) + (seed << jnp.uint32(6))
                        + (seed >> jnp.uint32(2)))
        out.append(_u2f(_nested_uniform_scramble(res[d], dseed)))
    return out


def _toroidal_shift(u, off):
    s = u + np.float32(off)
    return s - jnp.floor(s)


# ---------------------------------------------------------------------------
# MIS + rho lookups
# ---------------------------------------------------------------------------

def _mis_weight(p1, p2):
    divisor = p1 + p2
    r = p1 / jnp.where(divisor == 0.0, 1.0, divisor)
    invalid = jnp.isinf(divisor) | jnp.isnan(r)
    return jnp.where(invalid, jnp.where(p1 <= p2, 0.0, 1.0), r)


def _rho_lookup_rows(table_ref, x, y):
    """Bilinear fetch of table[y, x] (coords in [0,1], boundary-aligned,
    shading/fittings.py _bilinear_2d) for an (8,128) lane tile.

    Per sublane row: hat weights over the 32-entry axes become (32, 128)
    columns; column interp is one (32,32)@(32,128) MXU matmul, row interp a
    sublane reduction.
    """
    tab = table_ref[:, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0).astype(jnp.float32)
    rows = []
    for s in range(8):
        fx = jnp.clip(x[s:s + 1, :], 0.0, 1.0) * 31.0     # (1,128)
        fy = jnp.clip(y[s:s + 1, :], 0.0, 1.0) * 31.0
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota - fx))   # (32,128)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iota - fy))
        col = jax.lax.dot_general(
            tab, wx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (32,128)
        rows.append(jnp.sum(wy * col, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# GGX reflection lobe (bsdf/ggx.py, tile form; specularity = rgb tiles)
# ---------------------------------------------------------------------------

def _ggx_ndf(alpha, abs_cos):
    a2 = alpha * alpha
    c2 = abs_cos * abs_cos
    s2 = jnp.maximum(1.0 - c2, 0.0)
    q = jnp.maximum(c2 * a2 + s2, 1e-9)
    return a2 / (PI * q * q)


def _ggx_lambda(alpha, w):
    z2 = jnp.maximum(w[2] * w[2], 1e-12)
    return 0.5 * (-1.0 + jnp.sqrt(
        1.0 + (jnp.square(alpha * w[0]) + jnp.square(alpha * w[1])) / z2))


def _ggx_g(alpha, wo, wi):
    return 1.0 / (1.0 + _ggx_lambda(alpha, wo) + _ggx_lambda(alpha, wi))


def _schlick(spec, abs_cos):
    t = jnp.maximum(1.0 - abs_cos, 0.0)
    t2 = t * t
    t5 = t2 * t2 * t
    return ((1.0 - t5) * spec[0] + t5, (1.0 - t5) * spec[1] + t5,
            (1.0 - t5) * spec[2] + t5)


def _bounded_k(alpha, wo):
    a2 = alpha * alpha
    s = 1.0 + jnp.sqrt(_gsafe(wo[0] * wo[0] + wo[1] * wo[1]))
    s2 = s * s
    return (1.0 - a2) * s2 / (s2 + a2 * wo[2] * wo[2])


def _ggx_bounded_vndf_pdf(alpha, wo, wi):
    h = _normalize(_add(wo, wi))
    ndf = _ggx_ndf(alpha, jnp.abs(h[2]))
    ao2 = jnp.square(alpha * wo[0]) + jnp.square(alpha * wo[1])
    t = jnp.sqrt(_gsafe(ao2 + wo[2] * wo[2]))
    k = _bounded_k(alpha, wo)
    upper = ndf / (2.0 * (k * wo[2] + t))
    neg = wo[2] < 0.0
    safe_ao2 = jnp.where(neg, jnp.maximum(2.0 * ao2, 1e-10), 1.0)
    lower = ndf * (t - wo[2]) / safe_ao2
    return jnp.where(neg, lower, upper)


def _ggx_bounded_vndf_sample(alpha, wo, u0, u1):
    wo_std = _normalize((wo[0] * alpha, wo[1] * alpha, wo[2]))
    phi = TWO_PI * u1
    k = _bounded_k(alpha, wo)
    b = jnp.where(wo[2] >= 0.0, k * wo_std[2], wo_std[2])
    z = (1.0 - u0) * (1.0 + b) - b
    sin_theta = jnp.sqrt(jnp.clip(1.0 - z * z, 1e-12, 1.0))
    o_std = (sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), z)
    h_std = _add(wo_std, o_std)
    h = _normalize((h_std[0] * alpha, h_std[1] * alpha, h_std[2]))
    wi = _reflect(_scale(wo, -1.0), h)
    return wi, _ggx_bounded_vndf_pdf(alpha, wo, wi)


def _ggx_r_evaluate(alpha, spec3, wo, wi):
    """→ f rgb tiles (bsdf/ggx.py r_evaluate)."""
    same_hemi = wo[2] * wi[2] > 0.0
    smooth = alpha <= MIN_ALPHA
    valid = (~smooth) & same_hemi
    h = _normalize(_add(wo, wi))
    g = _ggx_g(alpha, wo, wi)
    d = _ggx_ndf(alpha, jnp.abs(h[2]))
    f3 = _schlick(spec3, jnp.abs(_dot(wo, h)))
    denom = 4.0 * wo[2] * wi[2]
    dg = d * g / jnp.where(jnp.abs(denom) > 1e-10, denom, 1.0)
    zero = jnp.zeros_like(dg)
    return _where3(valid, _scale(f3, dg), (zero, zero, zero))


def _ggx_r_pdf(alpha, wo, wi):
    same_hemi = wo[2] * wi[2] > 0.0
    mirror = (-wo[0], -wo[1], wo[2])
    wi_safe = _where3(same_hemi, wi, mirror)
    p = _ggx_bounded_vndf_pdf(alpha, wo, wi_safe)
    return jnp.where((alpha <= MIN_ALPHA) | ~same_hemi, 0.0, p)


def _ggx_r_sample(alpha, spec3, wo, u0, u1):
    """→ (wi, pdf, is_delta, f rgb) (bsdf/ggx.py r_sample)."""
    smooth = alpha <= MIN_ALPHA
    wi_rough, pdf_rough = _ggx_bounded_vndf_sample(alpha, wo, u0, u1)
    f_rough = _ggx_r_evaluate(alpha, spec3, wo, wi_rough)
    bad = wi_rough[2] < 0.0
    pdf_rough = jnp.where(bad, 0.0, pdf_rough)
    zero = jnp.zeros_like(pdf_rough)
    f_rough = _where3(bad, (zero, zero, zero), f_rough)
    wi_delta = (-wo[0], -wo[1], wo[2])
    abs_z = jnp.maximum(jnp.abs(wo[2]), 1e-7)
    fd = _schlick(spec3, jnp.abs(wo[2]))
    f_delta = _scale(fd, 1.0 / abs_z)
    wi = _where3(smooth, wi_delta, wi_rough)
    pdf = jnp.where(smooth, 1.0, pdf_rough)
    f = _where3(smooth, f_delta, f_rough)
    return wi, pdf, smooth, f


# ---------------------------------------------------------------------------
# EON Oren-Nayar (bsdf/oren_nayar.py + CLTC, tile form)
# ---------------------------------------------------------------------------

def _eon_evaluate_scalar(roughness, wo, wi):
    cos_i, cos_o = wi[2], wo[2]
    s = _dot(wi, wo) - cos_i * cos_o
    s_over_t = jnp.where(
        s > 0.0, s / jnp.maximum(jnp.maximum(cos_i, cos_o), 1e-7), s)
    a = 1.0 / (1.0 + _C1_FON * roughness)
    b = roughness * a
    f_single = INV_PI * a * (1.0 + roughness * s_over_t)

    def e_fon(cos_t):
        mucomp = 1.0 - cos_t
        g = jnp.zeros_like(cos_t)
        for coeff in (0.0714429953, -0.332181442, 0.491881867, 0.0571085289):
            g = mucomp * (coeff + g)
        return a + b * g

    ef_o = e_fon(cos_o)
    ef_i = e_fon(cos_i)
    avg_ef = a * (1.0 + _C2_FON * roughness)
    f_multi = (INV_PI * jnp.abs(1.0 - ef_o) * jnp.abs(1.0 - ef_i)
               / jnp.maximum(1e-7, 1.0 - avg_ef))
    return f_single + f_multi


def _eon_uniform_probability(roughness, cos_theta):
    return jnp.power(jnp.maximum(roughness, 1e-7), 0.1) * (
        0.162925 + cos_theta * (-0.372058
                                + (0.538233 - 0.290822 * cos_theta) * cos_theta))


def _cltc_coeffs(mu, r):
    a = 1.0 + r * (0.303392 + (-0.518982 + 0.111709 * mu) * mu
                   + (-0.276266 + 0.335918 * mu) * r)
    b = r * (-1.16407 + 1.15859 * mu + (0.150815 - 0.150105 * mu) * r) / (
        mu * mu * mu - 1.43545)
    c = 1.0 + (0.20013 + (-0.506373 + 0.261777 * mu) * mu) * r
    d = ((0.540852 + (-1.01625 + 0.475392 * mu) * mu) * r) / (
        -1.0743 + mu * (0.0725628 + mu))
    return a, b, c, d


def _ltc_tangent(wo):
    len2 = wo[0] * wo[0] + wo[1] * wo[1]
    has = len2 > 0.0
    inv = 1.0 / jnp.sqrt(_gsafe(len2, 1e-20))
    return (jnp.where(has, wo[0] * inv, 1.0), jnp.where(has, wo[1] * inv, 0.0))


def _cltc_pdf(roughness, wo, wi):
    cx, sx = _ltc_tangent(wo)
    lx = cx * wi[0] + sx * wi[1]
    ly = -sx * wi[0] + cx * wi[1]
    lz = wi[2]
    a, b, c, d = _cltc_coeffs(wo[2], roughness)
    det_m = c * (a - b * d)
    whx = c * (lx - b * lz)
    why = (a - b * d) * ly
    whz = -c * (d * lx - a * lz)
    wh_mag2 = whx * whx + why * why + whz * whz
    vz = 1.0 / jnp.sqrt(d * d + 1.0)
    s = 0.5 * (1.0 + vz)
    return (det_m * det_m / jnp.maximum(jnp.square(wh_mag2), 1e-10)
            * jnp.maximum(whz, 0.0) / (PI * s))


def _cltc_sample(roughness, wo, u0, u1):
    a, b, c, d = _cltc_coeffs(wo[2], roughness)
    radius = jnp.sqrt(u0)
    phi = TWO_PI * u1
    x = radius * jnp.cos(phi)
    y = radius * jnp.sin(phi)
    vz = 1.0 / jnp.sqrt(d * d + 1.0)
    s = 0.5 * (1.0 + vz)
    x = -_lerp(jnp.sqrt(_gsafe(1.0 - y * y)), x, s)
    whz = jnp.sqrt(_gsafe(1.0 - (x * x + y * y)))
    wi = (a * x + b * whz, c * y, d * x + whz)
    cx, sx = _ltc_tangent(wo)
    wx = cx * wi[0] - sx * wi[1]
    wy = sx * wi[0] + cx * wi[1]
    return _normalize((wx, wy, wi[2]))


def _eon_pdf(roughness, wo, wi):
    u_prob = _eon_uniform_probability(roughness, wo[2])
    return u_prob * (0.5 * INV_PI) + (1.0 - u_prob) * _cltc_pdf(roughness, wo, wi)


def _eon_sample(roughness, wo, u0, u1):
    """→ wi (pdf/f evaluated by the caller via evaluate-all)."""
    u_prob = _eon_uniform_probability(roughness, wo[2])
    pick_uniform = u0 <= u_prob
    ux_uniform = u0 / jnp.maximum(u_prob, 1e-7)
    ux_cltc = (u0 - u_prob) / jnp.maximum(1.0 - u_prob, 1e-7)
    ux = jnp.clip(jnp.where(pick_uniform, ux_uniform, ux_cltc), 0.0, 1.0 - 1e-7)
    # uniform hemisphere
    z = ux
    r = jnp.sqrt(_gsafe(1.0 - z * z))
    phi = TWO_PI * u1
    wi_uni = (r * jnp.cos(phi), r * jnp.sin(phi), z)
    wi_cltc = _cltc_sample(roughness, wo, ux, u1)
    return _where3(pick_uniform, wi_uni, wi_cltc)


# ---------------------------------------------------------------------------
# DefaultShading without coat (shading/default_shading.py, tile form)
# ---------------------------------------------------------------------------

class _Shading:
    """Per-lane constructed DefaultShading state (tiles)."""

    __slots__ = ("diffuse_tint", "roughness", "alpha", "specularity",
                 "specular_scale", "specular_probability",
                 "coat_scale", "coat_alpha", "coat_probability")

    def __init__(self, diffuse_tint, roughness, alpha, specularity,
                 specular_scale, specular_probability,
                 coat_scale=None, coat_alpha=None, coat_probability=None):
        self.diffuse_tint = diffuse_tint
        self.roughness = roughness
        self.alpha = alpha
        self.specularity = specularity
        self.specular_scale = specular_scale
        self.specular_probability = specular_probability
        self.coat_scale = coat_scale
        self.coat_alpha = coat_alpha
        self.coat_probability = coat_probability


_COAT_IOR = 1.5
_COAT_SPECULARITY = 0.04
_X_COAT = 1.0 - 1.0 / _COAT_IOR


def _shading_create(ggx_ref, fresnel_ref, tint3, roughness, specularity,
                    metallic, abs_cos_theta_o, coat=None,
                    coat_roughness=None):
    """DefaultShading.create in tile form. ``coat=None`` compiles the
    cheaper no-coat specialization (scenes without coat materials)."""
    if coat is not None:
        # Coat-modulated base roughness (OpenPBR eq. 86, Utils.h:363-367).
        has_coat = coat > 0.0
        r4 = jnp.minimum(1.0, roughness ** 4
                         + 2.0 * _X_COAT * coat_roughness ** 4)
        coat_mod = r4 ** 0.25
        roughness = jnp.where(has_coat, _lerp(roughness, coat_mod, coat),
                              roughness)
        # Re-base specularities under the coat medium (bsdf/fresnel.py).
        s_clamped = jnp.minimum(specularity, 0.9999)
        base_ior = 2.0 / (1.0 - jnp.sqrt(s_clamped)) - 1.0
        coated_diel = jnp.square((_COAT_IOR - base_ior)
                                 / (_COAT_IOR + base_ior))
        specularity = jnp.where(has_coat & (specularity < 1.0),
                                _lerp(specularity, coated_diel, coat),
                                specularity)
        cond3 = []
        for c in range(3):
            sc = jnp.clip(tint3[c], 0.0, 0.9999)
            a = sc - 1.0
            b = 2.0 * sc + 2.0
            d = b * b - 4.0 * a * a      # ext=0: c term == a
            ior = (-b + jnp.sqrt(jnp.maximum(d, 0.0))) / (2.0 * a)
            cs = jnp.square((_COAT_IOR - ior) / (_COAT_IOR + ior))
            cs = jnp.where(jnp.isnan(cs), 1.0, cs)
            cond3.append(jnp.where(has_coat, _lerp(tint3[c], cs, coat),
                                   tint3[c]))
        conductor = tuple(cond3)
    else:
        conductor = tint3

    base = _rho_lookup_rows(fresnel_ref, abs_cos_theta_o, roughness)
    full = _rho_lookup_rows(ggx_ref, abs_cos_theta_o, roughness)
    reflection_scale = 1.0 / jnp.maximum(full, 1e-5)
    rho = _lerp(base, full, specularity) * reflection_scale
    diel_transmission = 1.0 - rho
    dielectric_tint = _scale(tint3, diel_transmission)
    m_spec = (_lerp(specularity, conductor[0], metallic),
              _lerp(specularity, conductor[1], metallic),
              _lerp(specularity, conductor[2], metallic))
    one_minus_metal = 1.0 - metallic
    diffuse_tint = _scale(dielectric_tint, one_minus_metal)

    coat_scale = coat_alpha = coat_rho = None
    if coat is not None:
        # Coat layer: GGX with fixed IOR 1.5 / specularity 0.04.
        cbase = _rho_lookup_rows(fresnel_ref, abs_cos_theta_o,
                                 coat_roughness)
        cfull = _rho_lookup_rows(ggx_ref, abs_cos_theta_o, coat_roughness)
        coat_refl_scale = coat / jnp.maximum(cfull, 1e-5)
        coat_rho_full = (_lerp(cbase, cfull, _COAT_SPECULARITY)
                         * coat_refl_scale)
        coat_transmission = 1.0 - coat_rho_full
        coat_alpha_full = jnp.maximum(MIN_ALPHA,
                                      coat_roughness * coat_roughness)
        coat_scale = jnp.where(has_coat, coat_refl_scale, 0.0)
        coat_alpha = jnp.where(has_coat, coat_alpha_full, 0.0)
        coat_rho = jnp.where(has_coat, coat_rho_full, 0.0)
        reflection_scale = jnp.where(
            has_coat, reflection_scale * coat_transmission,
            reflection_scale)
        diffuse_tint = _where3(has_coat,
                               _scale(diffuse_tint, coat_transmission),
                               diffuse_tint)

    spec_rho = (_lerp(base, full, m_spec[0]) * reflection_scale,
                _lerp(base, full, m_spec[1]) * reflection_scale,
                _lerp(base, full, m_spec[2]) * reflection_scale)
    diffuse_rho_sum = diffuse_tint[0] + diffuse_tint[1] + diffuse_tint[2]
    specular_rho_sum = spec_rho[0] + spec_rho[1] + spec_rho[2]
    alpha = jnp.maximum(MIN_ALPHA, roughness * roughness)
    if coat is None:
        recip = 1.0 / jnp.maximum(diffuse_rho_sum + specular_rho_sum, 1e-9)
        return _Shading(diffuse_tint, roughness, alpha, m_spec,
                        reflection_scale, specular_rho_sum * recip)
    coat_rho_sum = 3.0 * coat_rho
    recip = 1.0 / jnp.maximum(
        diffuse_rho_sum + specular_rho_sum + coat_rho_sum, 1e-9)
    return _Shading(diffuse_tint, roughness, alpha, m_spec,
                    reflection_scale, specular_rho_sum * recip,
                    coat_scale, coat_alpha, coat_rho_sum * recip)


def _shading_evaluate_with_pdf(sh: _Shading, wo, wi):
    frontside = (wo[2] > _MIN_COS) & (wi[2] > _MIN_COS)
    d_scalar = _eon_evaluate_scalar(sh.roughness, wo, wi)
    d_pdf = _eon_pdf(sh.roughness, wo, wi)
    s_f = _ggx_r_evaluate(sh.alpha, sh.specularity, wo, wi)
    s_pdf = _ggx_r_pdf(sh.alpha, wo, wi)
    sp = sh.specular_probability
    f = _add(_scale(sh.diffuse_tint, d_scalar), _scale(s_f, sh.specular_scale))
    if sh.coat_scale is not None:
        cp = sh.coat_probability
        spec04 = (_COAT_SPECULARITY, _COAT_SPECULARITY, _COAT_SPECULARITY)
        c_f = _ggx_r_evaluate(sh.coat_alpha, spec04, wo, wi)
        c_pdf = _ggx_r_pdf(sh.coat_alpha, wo, wi)
        f = _add(f, _scale(c_f, sh.coat_scale))
        pdf = d_pdf * (1.0 - sp - cp) + s_pdf * sp + c_pdf * cp
    else:
        pdf = d_pdf * (1.0 - sp) + s_pdf * sp
    zero = jnp.zeros_like(pdf)
    return (_where3(frontside, f, (zero, zero, zero)),
            jnp.where(frontside, pdf, 0.0))


def _shading_sample(sh: _Shading, wo, u0, u1, u2):
    wi_dif = _eon_sample(sh.roughness, wo, u0, u1)
    wi_spec, spec_pdf, spec_delta, spec_f = _ggx_r_sample(
        sh.alpha, sh.specularity, wo, u0, u1)
    if sh.coat_scale is not None:
        cp = sh.coat_probability
        sample_coat = u2 < cp
        sample_specular = ~sample_coat & (u2 < cp + sh.specular_probability)
        spec04 = (_COAT_SPECULARITY, _COAT_SPECULARITY, _COAT_SPECULARITY)
        wi_coat, coat_pdf, coat_delta, coat_f = _ggx_r_sample(
            sh.coat_alpha, spec04, wo, u0, u1)
        wi = _where3(sample_coat, wi_coat,
                     _where3(sample_specular, wi_spec, wi_dif))
        f, pdf = _shading_evaluate_with_pdf(sh, wo, wi)
        frontside = wo[2] > _MIN_COS
        pdf = jnp.where(frontside, pdf, 0.0)
        delta_s = sample_specular & spec_delta
        delta_c = sample_coat & coat_delta
        is_delta = delta_s | delta_c
        pdf = jnp.where(delta_s, sh.specular_probability, pdf)
        pdf = jnp.where(delta_c, cp, pdf)
        f = _where3(delta_s, _scale(spec_f, sh.specular_scale), f)
        f = _where3(delta_c, _scale(coat_f, sh.coat_scale), f)
        return wi, pdf, is_delta & frontside, f
    sample_specular = u2 < sh.specular_probability
    wi = _where3(sample_specular, wi_spec, wi_dif)
    f, pdf = _shading_evaluate_with_pdf(sh, wo, wi)
    frontside = wo[2] > _MIN_COS
    pdf = jnp.where(frontside, pdf, 0.0)
    is_delta = sample_specular & spec_delta
    pdf = jnp.where(is_delta, sh.specular_probability, pdf)
    f = _where3(is_delta, _scale(spec_f, sh.specular_scale), f)
    return wi, pdf, is_delta & frontside, f


# ---------------------------------------------------------------------------
# Shading-model dispatch (path_tracer._ShadingBundle analogue)
# ---------------------------------------------------------------------------

def _model_evaluate_with_pdf(sh, tint3, rough, model, has_diffuse, wo, wi):
    """Per-lane model select: DefaultShading vs DiffuseShading
    (DiffuseShading.h:21-50 = EON only, raw textured tint/roughness)."""
    f, pdf = _shading_evaluate_with_pdf(sh, wo, wi)
    if has_diffuse:
        frontside = (wo[2] > _MIN_COS) & (wi[2] > _MIN_COS)
        d_scalar = _eon_evaluate_scalar(rough, wo, wi)
        d_pdf = _eon_pdf(rough, wo, wi)
        zero = jnp.zeros_like(d_pdf)
        fd = _where3(frontside, _scale(tint3, d_scalar), (zero, zero, zero))
        pd = jnp.where(frontside, d_pdf, 0.0)
        sel = model == 1.0
        f = _where3(sel, fd, f)
        pdf = jnp.where(sel, pd, pdf)
    return f, pdf


def _model_sample(sh, tint3, rough, model, has_diffuse, wo, u0, u1, u2):
    wi, pdf, is_delta, f = _shading_sample(sh, wo, u0, u1, u2)
    if has_diffuse:
        wi_d = _eon_sample(rough, wo, u0, u1)
        front_o = wo[2] > _MIN_COS
        d_scalar = _eon_evaluate_scalar(rough, wo, wi_d)
        d_pdf = _eon_pdf(rough, wo, wi_d)
        zero = jnp.zeros_like(d_pdf)
        fd = _where3(front_o, _scale(tint3, d_scalar), (zero, zero, zero))
        pd = jnp.where(front_o, d_pdf, 0.0)
        sel = model == 1.0
        wi = _where3(sel, wi_d, wi)
        pdf = jnp.where(sel, pd, pdf)
        f = _where3(sel, fd, f)
        is_delta = is_delta & ~sel
    return wi, pdf, is_delta, f


# ---------------------------------------------------------------------------
# Trace (dense Möller-Trumbore over the VMEM triangle table, per sublane row)
# ---------------------------------------------------------------------------

def _trace_row(tri_ref, n_tris, o, d, t_min, t_max_row, chunk=256,
               any_hit=False):
    """One (1,128) ray row vs all triangles. o/d: tuples of (1,128); t_min
    scalar-like tile (1,128); t_max_row (1,128).

    Returns (t, prim_f32, u, v) each (1,128); prim < 0 on miss — or a
    single occlusion mask (1,128) when ``any_hit``.
    """
    t_pad = tri_ref.shape[0]
    n_chunks = (t_pad + chunk - 1) // chunk
    best_t = jnp.full((1, 128), _BIG, jnp.float32)
    best_prim = jnp.full((1, 128), -1.0, jnp.float32)
    best_u = jnp.zeros((1, 128), jnp.float32)
    best_v = jnp.zeros((1, 128), jnp.float32)
    occluded = jnp.zeros((1, 128), jnp.float32)
    for ci in range(n_chunks):
        c0 = ci * chunk
        c = min(chunk, t_pad - c0)
        tri = tri_ref[c0:c0 + c, :]                 # (c, 16)
        v0 = (tri[:, 0:1], tri[:, 1:2], tri[:, 2:3])
        e1 = (tri[:, 3:4], tri[:, 4:5], tri[:, 5:6])
        e2 = (tri[:, 6:7], tri[:, 7:8], tri[:, 8:9])
        # (c,1) × (1,128) broadcasting.
        px = d[1] * e2[2] - d[2] * e2[1]
        py = d[2] * e2[0] - d[0] * e2[2]
        pz = d[0] * e2[1] - d[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0, 0.0) / jnp.where(
            det == 0.0, 1.0, det)
        tx = o[0] - v0[0]
        ty = o[1] - v0[1]
        tz = o[2] - v0[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1[2] - tz * e1[1]
        qy = tz * e1[0] - tx * e1[2]
        qz = tx * e1[1] - ty * e1[0]
        v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        tri_id = (np.float32(c0)
                  + jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0
                                             ).astype(jnp.float32))
        valid = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (t > t_min) & (t < t_max_row)
                 & (tri_id < np.float32(n_tris)))
        if any_hit:
            occluded = jnp.maximum(
                occluded,
                jnp.max(jnp.where(valid, 1.0, 0.0), axis=0, keepdims=True))
            continue
        t = jnp.where(valid, t, _BIG)
        row_best = jnp.min(t, axis=0, keepdims=True)            # (1,128)
        closer = row_best < best_t
        is_min = (t == row_best) & valid
        prim_c = jnp.min(jnp.where(is_min, tri_id, _BIG), axis=0,
                         keepdims=True)
        sel = is_min & (tri_id == prim_c)
        pick_u = jnp.max(jnp.where(sel, u, -_BIG), axis=0, keepdims=True)
        pick_v = jnp.max(jnp.where(sel, v, -_BIG), axis=0, keepdims=True)
        best_prim = jnp.where(closer, prim_c, best_prim)
        best_u = jnp.where(closer, pick_u, best_u)
        best_v = jnp.where(closer, pick_v, best_v)
        best_t = jnp.where(closer, row_best, best_t)
    if any_hit:
        return occluded
    return best_t, best_prim, best_u, best_v


def _trace(tri_ref, n_tris, o, d, t_min_tile, t_max):
    """Full (8,128) trace: per-row loop over sublanes. Returns
    (t, prim, u, v) (8,128) tiles, prim f32 (-1 = miss, t = _BIG)."""
    ts, ps, us, vs = [], [], [], []
    for s in range(8):
        o_row = (o[0][s:s + 1, :], o[1][s:s + 1, :], o[2][s:s + 1, :])
        d_row = (d[0][s:s + 1, :], d[1][s:s + 1, :], d[2][s:s + 1, :])
        tmax_row = t_max[s:s + 1, :] if t_max is not None \
            else jnp.full((1, 128), _BIG, jnp.float32)
        t, p, u, v = _trace_row(tri_ref, n_tris, o_row, d_row,
                                t_min_tile[s:s + 1, :], tmax_row)
        ts.append(t)
        ps.append(p)
        us.append(u)
        vs.append(v)
    return (jnp.concatenate(ts, axis=0), jnp.concatenate(ps, axis=0),
            jnp.concatenate(us, axis=0), jnp.concatenate(vs, axis=0))


def _trace_any(tri_ref, n_tris, o, d, t_min_tile, t_max):
    rows = []
    for s in range(8):
        o_row = (o[0][s:s + 1, :], o[1][s:s + 1, :], o[2][s:s + 1, :])
        d_row = (d[0][s:s + 1, :], d[1][s:s + 1, :], d[2][s:s + 1, :])
        rows.append(_trace_row(tri_ref, n_tris, o_row, d_row,
                               t_min_tile[s:s + 1, :], t_max[s:s + 1, :],
                               any_hit=True))
    return jnp.concatenate(rows, axis=0) > 0.0


def _fetch_attrs(attr_ref, prim):
    """One-hot MXU attribute fetch: (A, T) @ (T, 128) per sublane row →
    list of A (8,128) tiles."""
    a_rows, t_pad = attr_ref.shape
    tab = attr_ref[:, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 128), 0).astype(jnp.float32)
    per_attr = [[] for _ in range(a_rows)]
    for s in range(8):
        onehot = (iota == jnp.maximum(prim[s:s + 1, :], 0.0)).astype(
            jnp.float32)
        rows = jax.lax.dot_general(
            tab, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (A, 128)
        for a in range(a_rows):
            per_attr[a].append(rows[a:a + 1, :])
    return [jnp.concatenate(per_attr[a], axis=0) for a in range(a_rows)]


# ---------------------------------------------------------------------------
# Hierarchical trace (cluster-BVH walk with HBM->VMEM DMA, mid/large scenes)
# ---------------------------------------------------------------------------
#
# Scenes above MAX_TRIS keep the whole path in one kernel by swapping the
# dense VMEM trace for the block-BVH traversal of geometry/pallas_bvh.py,
# run per (1, 128) sublane ray row: a scalar SMEM stack walks the cluster
# BVH (node boxes VMEM-resident), and each touched leaf DMAs one
# CLUSTER_T-triangle block HBM->VMEM for a dense Moller-Trumbore row test.
# Attributes ride the walk: the cluster's attribute block is DMA'd
# alongside the triangles and folded into the running per-row best via a
# (A, CLUSTER_T) @ (CLUSTER_T, 128) one-hot MXU contraction whenever the
# row's best hit improves — so the megakernel never needs a VMEM-resident
# [A, T] table and the 1024-triangle VMEM cliff disappears (VERDICT r4 #3:
# the reference's single Trbvh path covers all scene sizes,
# OptiXRenderer/Renderer.cpp:161-182).

HIER_CLUSTER = 128        # finer than the wavefront's 512: the megakernel
                          # pays leaf tests as 8 x (cluster, 128) dense VPU
                          # math per visit, so cull granularity dominates
HIER_STACK = 64
HIER_MAX_TRIS = 262144    # traversal is O(touched clusters); cap generous
# Attr-merge dot implementation: True = 4-way bf16 split, single-pass
# DEFAULT dots (4 MXU passes; measured ~35% faster hier frames). False =
# one f32 HIGHEST dot (6 passes). Both are exact selections on every
# value table tested; interpret-mode A/B shows ~1% of pixels flip
# stochastic decisions between them (within every statistical gate).
ATTR_DOT_SPLIT = True
ATTR_ROWS = 24            # attr table rows (19 used; padded to 8-multiple)


def _hier_tracers(boxes_ref, meta_ref, tri_hbm, attr_hbm, stack_ref,
                  tri_buf, attr_buf, ts_ref, ps_ref, us_ref, vs_ref,
                  as_ref, sem_t, sem_a):
    """Build (trace_closest, trace_any) closures over the hier scratch.

    Layout: ONE walk per (8, 128) pixel block, everything lane-major — box
    probes run on full (8, 128) tiles (dense VPU tiles; a per-column walk
    was measured 30x slower: (128, 1) vectors use 1/128 of the lanes and
    8 walks pay 8x the stack/DMA serialization). The triangle table is
    slot-major [T_pad, 128] (components in lanes 0-8, rest zero-padding)
    so the leaf DMA slice is lane-aligned and component columns (C, 1)
    broadcast against (1, 128) ray rows without any transposes. Per-ray
    best state lives in (8, 128) scratch; the while-loop carry stays a
    scalar stack pointer (the pallas_bvh pattern — vector carries spill).
    At a leaf only rows whose rays can still improve inside the node run
    the dense Moller-Trumbore test (row granularity = 128 rays).
    Attributes ride the walk: (A, C) x (C, 128) one-hot contraction per
    improving row, merged under the `closer` mask.
    """
    # Every slot is admitted: padded slots carry e1 = e2 = 0 => det = 0
    # => Moller-Trumbore rejects them.

    def walk(o, d, t_min, t_max, want_attrs, any_hit):
        """Full-block traversal. o/d: tuples of (8, 128) tiles."""
        def safe_inv(x):
            mag = jnp.maximum(jnp.abs(x), 1e-12)
            return jnp.where(x < 0, -1.0, 1.0) / mag

        inv_d = tuple(safe_inv(c) for c in d)

        def probe_mask(node):
            best_t = ts_ref[...]

            def axis_near_far(k):
                # SMEM scalar reads: a scalar-to-(8,128) splat is always
                # legal, while a VMEM (1,1)->(8,128) vector broadcast is
                # not implemented in Mosaic.
                lo = boxes_ref[k, node]
                hi = boxes_ref[k + 3, node]
                t0 = (lo - o[k]) * inv_d[k]                      # (8, 128)
                t1 = (hi - o[k]) * inv_d[k]
                return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

            n0, f0 = axis_near_far(0)
            n1, f1 = axis_near_far(1)
            n2, f2 = axis_near_far(2)
            near = jnp.maximum(jnp.maximum(n0, n1), jnp.maximum(n2, t_min))
            far = jnp.minimum(jnp.minimum(f0, f1), f2)
            hit = (near <= far) & (far > 0.0) & (near < best_t)
            return hit, near

        def probe(node):
            hit, near = probe_mask(node)
            # One fused reduction: any() == (near_est < _BIG) here (hit
            # implies near < best_t <= _BIG); each scalar reduce
            # serializes the walk loop.
            near_est = jnp.min(jnp.where(hit, near, _BIG))
            return near_est < _BIG, near_est

        def mt_row(s, tri, base_id):
            """(1,128) ray row vs the (C, 128-padded) cluster in tri."""
            o_r = tuple(c[s:s + 1, :] for c in o)
            d_r = tuple(c[s:s + 1, :] for c in d)
            v0 = (tri[:, 0:1], tri[:, 1:2], tri[:, 2:3])     # (C, 1)
            e1 = (tri[:, 3:4], tri[:, 4:5], tri[:, 5:6])
            e2 = (tri[:, 6:7], tri[:, 7:8], tri[:, 8:9])
            px = d_r[1] * e2[2] - d_r[2] * e2[1]             # (C, 128)
            py = d_r[2] * e2[0] - d_r[0] * e2[2]
            pz = d_r[0] * e2[1] - d_r[1] * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0, 0.0) / jnp.where(
                det == 0.0, 1.0, det)
            tx = o_r[0] - v0[0]
            ty = o_r[1] - v0[1]
            tz = o_r[2] - v0[2]
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1[2] - tz * e1[1]
            qy = tz * e1[0] - tx * e1[2]
            qz = tx * e1[1] - ty * e1[0]
            v = (d_r[0] * qx + d_r[1] * qy + d_r[2] * qz) * inv_det
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
            # Dynamic-scalar + iota broadcasts only lower for int32
            # (pallas_bvh precedent); ids go to f32 at the (1, 128) write.
            ids = (base_id
                   + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0))
            best = ts_ref[s:s + 1, :]
            valid = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t > t_min[s:s + 1, :])
                     & (t < t_max[s:s + 1, :]) & (t < best))
            t = jnp.where(valid, t, _BIG)
            row_best = jnp.min(t, axis=0, keepdims=True)     # (1, 128)
            closer = row_best < best
            is_min = (t == row_best) & valid
            col = jnp.min(jnp.where(is_min, ids, jnp.int32(0x7FFFFFFF)),
                          axis=0, keepdims=True)
            sel = is_min & (ids == col)
            pick_u = jnp.max(jnp.where(sel, u, -_BIG), axis=0, keepdims=True)
            pick_v = jnp.max(jnp.where(sel, v, -_BIG), axis=0, keepdims=True)
            ps_ref[s:s + 1, :] = jnp.where(closer, col.astype(jnp.float32),
                                           ps_ref[s:s + 1, :])
            us_ref[s:s + 1, :] = jnp.where(closer, pick_u,
                                           us_ref[s:s + 1, :])
            vs_ref[s:s + 1, :] = jnp.where(closer, pick_v,
                                           vs_ref[s:s + 1, :])
            ts_ref[s:s + 1, :] = jnp.where(closer, row_best, best)
            if any_hit:
                # Freeze hit lanes: best = t_min ⇒ no further box passes.
                ts_ref[s:s + 1, :] = jnp.where(
                    ps_ref[s:s + 1, :] >= 0.0, t_min[s:s + 1, :],
                    ts_ref[s:s + 1, :])
            if want_attrs:
                @pl.when(jnp.any(closer))
                def _():
                    onehot = jnp.where(sel & closer, 1.0, 0.0)   # (C, 128)
                    # Manual 4-way bf16 split (4x8 bits > 24-bit f32
                    # mantissa + rounding carries) with single-pass
                    # DEFAULT dots: EXACT for one-hot selection (each
                    # product is value x 1.0, one nonzero term per lane —
                    # no accumulation error) at 4 MXU passes instead of
                    # HIGHEST's 6 (these small latency-bound dots were
                    # ~50% of the hier frame; Mosaic does not lower
                    # Precision.HIGH, and a 3-way split left rare
                    # rounding residue that flipped 1% of pixels).
                    a32 = attr_buf[...]
                    hi = a32.astype(jnp.bfloat16)
                    r1 = a32 - hi.astype(jnp.float32)
                    mid = r1.astype(jnp.bfloat16)
                    r2 = r1 - mid.astype(jnp.float32)
                    lo = r2.astype(jnp.bfloat16)
                    lo2 = (r2 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
                    oh = onehot.astype(jnp.bfloat16)
                    dims = (((1,), (0,)), ((), ()))

                    def dot(m):
                        return jax.lax.dot_general(
                            m, oh, dims, preferred_element_type=jnp.float32)

                    if ATTR_DOT_SPLIT:
                        rows = dot(hi) + dot(mid) + dot(lo) + dot(lo2)
                    else:
                        rows = jax.lax.dot_general(
                            a32, onehot, dims,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    for a in range(ATTR_ROWS):
                        r0 = 8 * a + s
                        as_ref[r0:r0 + 1, :] = jnp.where(
                            closer, rows[a:a + 1, :], as_ref[r0:r0 + 1, :])

        def leaf_test(cluster, hit):
            dma_t = pltpu.make_async_copy(
                tri_hbm.at[pl.ds(cluster * HIER_CLUSTER, HIER_CLUSTER), :],
                tri_buf, sem_t)
            dma_t.start()
            if want_attrs:
                dma_a = pltpu.make_async_copy(
                    attr_hbm.at[:, pl.ds(cluster * HIER_CLUSTER,
                                         HIER_CLUSTER)],
                    attr_buf, sem_a)
                dma_a.start()
            dma_t.wait()
            if want_attrs:
                dma_a.wait()
            tri = tri_buf[...]                           # (C, 128) lanes 0-8
            base_id = cluster * HIER_CLUSTER
            for s in range(8):
                row_hit = jnp.any(hit[s:s + 1, :])

                @pl.when(row_hit)
                def _(s=s):
                    mt_row(s, tri, base_id)

        def cond(sp):
            return sp > 0

        def body(sp):
            node = stack_ref[sp - 1]
            sp = sp - 1
            meta = meta_ref[node]
            is_leaf = meta < 0

            @pl.when(is_leaf)
            def _():
                hit, _near = probe_mask(node)

                @pl.when(jnp.any(hit))
                def _():
                    leaf_test(-meta - 1, hit)

            left = node + 1
            right = meta
            any_l, near_l = probe(left)
            any_r, near_r = probe(jnp.maximum(right, 0))
            push_l = jnp.logical_and(jnp.logical_not(is_leaf), any_l)
            push_r = jnp.logical_and(jnp.logical_not(is_leaf), any_r)
            swap = near_l > near_r
            first = jnp.where(swap, right, left)
            second = jnp.where(swap, left, right)
            push_first = jnp.where(swap, push_r, push_l)
            push_second = jnp.where(swap, push_l, push_r)
            stack_ref[sp] = second
            sp = sp + jnp.where(push_second, 1, 0)
            stack_ref[sp] = first
            sp = sp + jnp.where(push_first, 1, 0)
            if any_hit:
                done = (ps_ref[...] >= 0.0) | (t_max <= t_min)
                sp = jnp.where(jnp.all(done), 0, sp)
            return sp

        ts_ref[...] = jnp.minimum(t_max, _BIG)
        ps_ref[...] = jnp.full(LANES, -1.0, jnp.float32)
        us_ref[...] = jnp.zeros(LANES, jnp.float32)
        vs_ref[...] = jnp.zeros(LANES, jnp.float32)
        if want_attrs:
            # Zero attrs on miss lanes (finite; _normalize is guarded, and
            # every consumer masks by the hit mask — mirrors the dense
            # path's clamped-prim garbage fetch).
            for a in range(ATTR_ROWS):
                as_ref[8 * a:8 * a + 8, :] = jnp.zeros(LANES, jnp.float32)

        # A block whose every lane is disabled (t_max = 0 ⇒ far < near at
        # the root) fails the root probe immediately — drained iterations
        # cost one box test per block (the hier analogue of the
        # wavefront's live-prefix skipping).
        root_any, _n = probe(0)

        @pl.when(root_any)
        def _():
            stack_ref[0] = jnp.int32(0)
            jax.lax.while_loop(cond, body, jnp.int32(1))

    def trace_closest(o, d, t_min, t_max, want_attrs=True):
        if t_max is None:
            t_max = jnp.full(LANES, _BIG, jnp.float32)
        walk(o, d, t_min, t_max, want_attrs, any_hit=False)
        attrs = ([as_ref[8 * a:8 * a + 8, :] for a in range(ATTR_ROWS)]
                 if want_attrs else None)
        return ts_ref[...], ps_ref[...], us_ref[...], vs_ref[...], attrs

    def trace_any(o, d, t_min, t_max):
        walk(o, d, t_min, t_max, want_attrs=False, any_hit=True)
        return ps_ref[...] >= 0.0

    return trace_closest, trace_any


# ---------------------------------------------------------------------------
# Transcendentals Mosaic lacks (Cephes-style f32 approximations)
# ---------------------------------------------------------------------------

def _atan_pos(x):
    """arctan for x >= 0, Cephes atanf 3-segment reduction (~1e-7 abs)."""
    t_lo = 0.4142135623730950   # tan(pi/8)
    t_hi = 2.414213562373095    # tan(3pi/8)
    big = x > t_hi
    mid = (x > t_lo) & ~big
    z = jnp.where(big, -1.0 / jnp.maximum(x, 1e-30),
                  jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    off = jnp.where(big, PI / 2, jnp.where(mid, PI / 4, 0.0))
    z2 = z * z
    p = (((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
          + 1.99777106478e-1) * z2 - 3.33329491539e-1)
    return off + z + z * z2 * p


def _atan2_tile(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    w = _atan_pos(ay / jnp.maximum(ax, 1e-30))
    a = jnp.where(x >= 0.0, w, PI - w)
    a = jnp.where(ax == 0.0, PI / 2, a)       # x == 0 → ±π/2 (or 0 if y==0)
    a = jnp.where((ax == 0.0) & (ay == 0.0), 0.0, a)
    return jnp.where(y < 0.0, -a, a)


def _asin_tile(v):
    v = jnp.clip(v, -1.0, 1.0)
    return _atan2_tile(v, jnp.sqrt(jnp.maximum(1.0 - v * v, 0.0)))


def _fetch_2d(table_ref, idx, base_row, rows_per_attr, n_attrs):
    """Fetch ``n_attrs`` attributes of a table packed as
    ``(n_attrs × rows_per_attr, 128)`` at per-lane f32 flat indices
    ``idx`` (8,128) → list of n_attrs (8,128) tiles.

    Two-stage one-hot: a single (128,128) column one-hot per sublane row
    selects ``idx % 128`` across ALL attribute rows in one MXU matmul;
    a masked sublane reduction then picks row ``idx // 128``. Peak
    transient is the (A·R, 128) column-gathered block — this replaced a
    flat (N,128) one-hot whose unrolled chunks blew the 16 MB VMEM stack
    for N = 8192 pool tables."""
    R = rows_per_attr
    inv128 = np.float32(1.0 / 128.0)
    row = jnp.floor(idx * inv128)
    col = idx - row * 128.0
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0
                                      ).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0
                                      ).astype(jnp.float32)
    tab = table_ref[base_row:base_row + n_attrs * R, :]   # (A*R, 128)
    outs = [[] for _ in range(n_attrs)]
    for s in range(8):
        onehot = (iota_c == col[s:s + 1, :]).astype(jnp.float32)
        tmp = jax.lax.dot_general(
            tab, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (A*R, 128)
        rmask = (iota_r == row[s:s + 1, :]).astype(jnp.float32)
        for a in range(n_attrs):
            outs[a].append(jnp.sum(rmask * tmp[a * R:(a + 1) * R, :],
                                   axis=0, keepdims=True))
    return [jnp.concatenate(o, axis=0) for o in outs]


# ---------------------------------------------------------------------------
# Environment (latlong eval + per-pixel pdf + presampled-pool NEE)
# ---------------------------------------------------------------------------

def _dir_to_latlong_uv(d):
    """lights/environment.py direction_to_latlong_uv in tile form."""
    u = (_atan2_tile(d[2], d[0]) + PI) * (0.5 / PI)
    v = (_asin_tile(d[1]) + PI * 0.5) * (1.0 / PI)
    return u, v


def _env_evaluate(env_img_ref, env_meta, env_tint, d):
    """Bilinear latlong radiance fetch × tint (environment_evaluate)."""
    w, h = env_meta[0], env_meta[1]
    u, v = _dir_to_latlong_uv(d)
    x = u * np.float32(w) - 0.5
    y = v * np.float32(h) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0w = x0 - np.float32(w) * jnp.floor(x0 / np.float32(w))
    x1 = x0 + 1.0
    x1w = x1 - np.float32(w) * jnp.floor(x1 / np.float32(w))
    y0c = jnp.clip(y0, 0.0, np.float32(h - 1))
    y1c = jnp.clip(y0 + 1.0, 0.0, np.float32(h - 1))
    r_img = env_meta[6]
    p00 = _fetch_2d(env_img_ref, y0c * np.float32(w) + x0w, 0, r_img, 3)
    p10 = _fetch_2d(env_img_ref, y0c * np.float32(w) + x1w, 0, r_img, 3)
    p01 = _fetch_2d(env_img_ref, y1c * np.float32(w) + x0w, 0, r_img, 3)
    p11 = _fetch_2d(env_img_ref, y1c * np.float32(w) + x1w, 0, r_img, 3)
    out = []
    for c in range(3):
        top = p00[c] * (1.0 - fx) + p10[c] * fx
        bot = p01[c] * (1.0 - fx) + p11[c] * fx
        out.append((top * (1.0 - fy) + bot * fy) * env_tint[c])
    return tuple(out)


def _env_pdf(env_pdf_ref, env_meta, d):
    """environment_pdf: per-pixel solid-angle pdf / sinθ (tile form)."""
    pw, ph = env_meta[2], env_meta[3]
    u, v = _dir_to_latlong_uv(d)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - d[1] * d[1], 0.0))
    xi = jnp.clip(jnp.floor(u * np.float32(pw)), 0.0, np.float32(pw - 1))
    yi = jnp.clip(jnp.floor(v * np.float32(ph)), 0.0, np.float32(ph - 1))
    pdf = _fetch_2d(env_pdf_ref, yi * np.float32(pw) + xi, 0,
                    env_meta[7], 1)[0]
    pdf = pdf / jnp.maximum(sin_theta, 1e-10)
    return jnp.where(sin_theta == 0.0, 0.0, pdf)


def _material_coverage(mats_ref, mat_idx, one):
    """Per-lane material coverage / cutout threshold (SMEM col 10 scan)."""
    cov = one
    for k in range(mats_ref.shape[0]):
        cov = jnp.where(mat_idx == np.float32(k), mats_ref[k, 10], cov)
    return cov


def _round_half_even(x):
    """jnp.round semantics (ties to even) from primitives Mosaic lowers."""
    f = jnp.floor(x)
    d = x - f
    up = f + 1.0
    f_even = jnp.floor(f * 0.5) * 2.0 == f
    return jnp.where(d > 0.5, up,
                     jnp.where(d < 0.5, f, jnp.where(f_even, f, up)))


def _tex_fetch_nearest(tex_ref, meta, u, v):
    """NEAREST fetch of texture ``meta`` = (base, w, h, wrap_u, wrap_v,
    filter) for (8,128) uv tiles → 4 rgba tiles.

    Mirrors io/texture.py sample_texture exactly (v-flip, float-space wrap,
    −0.5 texel center, round-half-even, integer wrap) so megakernel↔
    wavefront parity holds texel-for-texel. The fetch itself is the
    one-hot MXU contraction over the flattened (8, N) texel table."""
    from bifrost3d_tpu.io.texture import WRAP_REPEAT

    base_row, w, h, wrap_u, wrap_v, _filt, r_tex = meta
    vv = 1.0 - v
    fu = u - jnp.floor(u) if wrap_u == WRAP_REPEAT else jnp.clip(u, 0.0, 1.0)
    fv = (vv - jnp.floor(vv) if wrap_v == WRAP_REPEAT
          else jnp.clip(vv, 0.0, 1.0))
    x = _round_half_even(fu * np.float32(w) - 0.5)
    y = _round_half_even(fv * np.float32(h) - 0.5)
    if wrap_u == WRAP_REPEAT:
        x = x - np.float32(w) * jnp.floor(x / np.float32(w))
    else:
        x = jnp.clip(x, 0.0, np.float32(w - 1))
    if wrap_v == WRAP_REPEAT:
        y = y - np.float32(h) * jnp.floor(y / np.float32(h))
    else:
        y = jnp.clip(y, 0.0, np.float32(h - 1))
    flat = y * np.float32(w) + x                          # (8,128)
    return _fetch_2d(tex_ref, flat, base_row, r_tex, 4)


# ---------------------------------------------------------------------------
# Lights (sphere cone sampling + directional; lights SMEM (L, 12))
# ---------------------------------------------------------------------------

def _light_columns(lights_ref, k):
    """SMEM scalars of light k: kind handled statically by the caller."""
    return dict(
        px=lights_ref[k, 0], py=lights_ref[k, 1], pz=lights_ref[k, 2],
        radius=lights_ref[k, 3],
        pwx=lights_ref[k, 4], pwy=lights_ref[k, 5], pwz=lights_ref[k, 6],
        dx=lights_ref[k, 7], dy=lights_ref[k, 8], dz=lights_ref[k, 9],
        cos_angle=lights_ref[k, 10])


def _sphere_light_sample(L, lit, u0, u1):
    """lights/analytic.py sphere_light_sample, one light, tile lanes.
    Returns (dir3, dist, radiance3, pdf, is_delta)."""
    to_center = (L["px"] - lit[0], L["py"] - lit[1], L["pz"] - lit[2])
    dist2 = _dot(to_center, to_center)
    radius = L["radius"]
    sin2 = radius * radius / jnp.maximum(dist2, 1e-10)
    is_point = sin2 <= 0.0
    cos_theta_max = jnp.sqrt(_gsafe(1.0 - sin2))
    # cone sample about axis
    cos_theta = (1.0 - u0) + u0 * cos_theta_max
    sin_theta = jnp.sqrt(_gsafe(1.0 - cos_theta * cos_theta))
    phi = TWO_PI * u1
    cone_dir = (jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)
    axis = _normalize(to_center)
    direction = _to_world(cone_dir, axis)
    cone_p = 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_theta_max, 1e-10))
    # exact sphere t from the lit point
    b = _dot(to_center, direction)
    det = radius * radius - (dist2 - b * b)
    sqrt_det = jnp.sqrt(_gsafe(det))
    t = jnp.where(b - sqrt_det > 0, b - sqrt_det, b + sqrt_det)
    t = jnp.where((det >= 0) & (t > 0), t, -1.0)
    t = jnp.where(t <= 0.0, b, t)
    area = 4.0 * PI * radius * radius
    inv_rad = 1.0 / jnp.maximum(PI * area, 1e-10)
    radiance_cone = (L["pwx"] * inv_rad, L["pwy"] * inv_rad,
                     L["pwz"] * inv_rad)
    # point fallback
    dist = jnp.sqrt(_gsafe(dist2))
    inv_p = 1.0 / (4.0 * PI * dist2)
    radiance_point = (L["pwx"] * inv_p, L["pwy"] * inv_p, L["pwz"] * inv_p)
    dir_point = _scale(to_center, 1.0 / jnp.maximum(dist, 1e-10))
    t_point = dist - radius
    direction = _where3(is_point, dir_point, direction)
    distance = jnp.where(is_point, t_point, t) * (1.0 - 1e-6)
    radiance = _where3(is_point, radiance_point, radiance_cone)
    pdf = jnp.where(is_point, 1.0, cone_p)
    return direction, distance, radiance, pdf, is_point


def _sphere_light_pdf(L, lit, direction):
    to_center = (L["px"] - lit[0], L["py"] - lit[1], L["pz"] - lit[2])
    radius = L["radius"]
    sin2 = radius * radius / jnp.maximum(_dot(to_center, to_center), 1e-10)
    cos_theta_max = jnp.sqrt(_gsafe(1.0 - sin2))
    cos_theta = _dot(direction, _normalize(to_center))
    valid = (cos_theta >= cos_theta_max) & (sin2 > 0.0)
    return jnp.where(
        valid, 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_theta_max, 1e-10)), 0.0)


def _sphere_light_evaluate(L):
    area = 4.0 * PI * L["radius"] * L["radius"]
    inv = 1.0 / jnp.maximum(PI * area, 1e-10)
    return (L["pwx"] * inv, L["pwy"] * inv, L["pwz"] * inv)


_MIN_SPOT_CONE = 1e-5


def _ray_plane_t_tile(o, d, p, n):
    denom = _dot(d, n)
    safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    return (_dot(p, n) - _dot(o, n)) / safe


def _spot_light_evaluate(L, lit, direction):
    """lights/analytic.py spot_light_evaluate, tile form → rgb tiles."""
    ldir = (L["dx"], L["dy"], L["dz"])
    pos = (L["px"], L["py"], L["pz"])
    cos_theta = -_dot(ldir, direction)
    cos_angle = L["cos_angle"]
    radius = L["radius"]
    norm = TWO_PI * (1.0 - cos_angle)
    is_delta = radius == 0.0
    diff = _sub(pos, lit)
    d2 = _dot(diff, diff)
    area = PI * radius * radius
    norm = norm * jnp.where(is_delta, d2, area * cos_theta)
    inv = 1.0 / jnp.maximum(norm, 1e-10)
    lit_mask = cos_theta > cos_angle
    zero = jnp.zeros_like(inv)
    return _where3(lit_mask,
                   (L["pwx"] * inv, L["pwy"] * inv, L["pwz"] * inv),
                   (zero, zero, zero))


def _spot_light_sample(L, lit, u0, u1):
    """spot_light_sample (SpotLightImpl.h:77-131) in tile form →
    (dir3, dist, radiance3, pdf, is_delta_tile)."""
    ldir = (L["dx"], L["dy"], L["dz"])
    pos = (L["px"], L["py"], L["pz"])
    radius = L["radius"]
    cos_angle = L["cos_angle"]
    is_delta = radius == 0.0

    to_light = _sub(pos, lit)
    dist = jnp.sqrt(_gsafe(_dot(to_light, to_light)))
    dir_delta = _scale(to_light, 1.0 / jnp.maximum(dist, 1e-10))

    neg_ldir = _scale(ldir, -1.0)
    t_plane = _ray_plane_t_tile(lit, neg_ldir, pos, ldir)
    cone_radius_at = t_plane * jnp.sqrt(
        _gsafe(1.0 - cos_angle * cos_angle, 0.0)) \
        / jnp.maximum(cos_angle, 1e-9)
    use_cone = (radius > cone_radius_at) & (cos_angle > _MIN_SPOT_CONE)

    # Cone path (sample about the spot axis, pointing backwards).
    cos_theta = (1.0 - u0) + u0 * cos_angle
    sin_theta = jnp.sqrt(_gsafe(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * u1
    cone_local = (jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta,
                  cos_theta)
    cone_p = 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_angle, 1e-10))
    dir_cone = _scale(_to_world(cone_local, ldir), -1.0)
    t_cone = _ray_plane_t_tile(lit, dir_cone, pos, ldir)
    hit = _add(lit, _scale(dir_cone, t_cone))
    off = _sub(hit, pos)
    on_light = _dot(off, off) < radius * radius
    ev_cone = _spot_light_evaluate(L, lit, dir_cone)
    zero = jnp.zeros_like(t_cone)
    rad_cone = _where3(on_light, ev_cone, (zero, zero, zero))

    # Disk path (concentric mapping, Distributions.h).
    r_safe = jnp.maximum(radius, 1e-9)
    a = 2.0 * u0 - 1.0
    b = 2.0 * u1 - 1.0
    b = jnp.where(b == 0.0, 1.0, b)
    use_a = a * a > b * b
    rr = jnp.where(use_a, a, b) * r_safe
    safe_a = jnp.where(a == 0.0, 1.0, a)
    phi_d = jnp.where(use_a, (PI / 4) * (b / safe_a),
                      (PI / 2) - (PI / 4) * (a / b))
    dx = rr * jnp.cos(phi_d)
    dy = rr * jnp.sin(phi_d)
    disk_p = 1.0 / (PI * r_safe * r_safe)
    axis_x = jnp.abs(ldir[0]) > 0.9
    axis = (jnp.where(axis_x, 0.0, 1.0), jnp.where(axis_x, 1.0, 0.0),
            jnp.zeros_like(ldir[0]))
    tangent = _normalize(_cross(axis, ldir))
    bitangent = _cross(ldir, tangent)
    sampled = _add(pos, _add(_scale(tangent, dx), _scale(bitangent, dy)))
    to_s = _sub(sampled, lit)
    dist_disk = jnp.sqrt(_gsafe(_dot(to_s, to_s)))
    dir_disk = _scale(to_s, 1.0 / jnp.maximum(dist_disk, 1e-10))
    cos_theta_disk = -_dot(ldir, dir_disk)
    pdf_disk = disk_p * dist_disk * dist_disk \
        / jnp.maximum(cos_theta_disk, 1e-9)
    rad_disk = _spot_light_evaluate(L, lit, dir_disk)

    use_cone_b = use_cone & ~is_delta
    direction = _where3(is_delta, dir_delta,
                        _where3(use_cone_b, dir_cone, dir_disk))
    distance = jnp.where(is_delta, dist,
                         jnp.where(use_cone_b, t_cone, dist_disk)) \
        * (1.0 - 1e-6)
    ev_delta = _spot_light_evaluate(L, lit, dir_delta)
    radiance = _where3(is_delta, ev_delta,
                       _where3(use_cone_b, rad_cone, rad_disk))
    pdf = jnp.where(is_delta, 1.0, jnp.where(use_cone_b, cone_p, pdf_disk))
    return direction, distance, radiance, pdf, is_delta


def _spot_light_pdf(L, lit, direction):
    """spot_light_pdf in tile form."""
    ldir = (L["dx"], L["dy"], L["dz"])
    pos = (L["px"], L["py"], L["pz"])
    radius = L["radius"]
    cos_angle = L["cos_angle"]
    cos_theta = -_dot(ldir, direction)
    neg_ldir = _scale(ldir, -1.0)
    t_plane = _ray_plane_t_tile(lit, neg_ldir, pos, ldir)
    cone_radius_at = t_plane * jnp.sqrt(
        _gsafe(1.0 - cos_angle * cos_angle, 0.0)) \
        / jnp.maximum(cos_angle, 1e-9)
    use_cone = (radius > cone_radius_at) & (cos_angle > _MIN_SPOT_CONE)
    pdf_cone = 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_angle, 1e-10))
    t = _ray_plane_t_tile(lit, direction, pos, ldir)
    hit = _add(lit, _scale(direction, t))
    off = _sub(hit, pos)
    on_disk = (t >= 0.0) & (_dot(off, off) < radius * radius)
    pdf_disk = jnp.where(
        on_disk,
        (1.0 / (PI * jnp.maximum(radius * radius, 1e-18)))
        * t * t / jnp.maximum(cos_theta, 1e-9), 0.0)
    valid = (cos_theta > 0.0) & (radius > 0.0)
    return jnp.where(valid, jnp.where(use_cone, pdf_cone, pdf_disk), 0.0)


def _ray_spot_disk_t_tile(o, d, L):
    """Ray vs the spot's disk (Intersect::ray_disk, LightSources.cu:40-41)."""
    ldir = (L["dx"], L["dy"], L["dz"])
    pos = (L["px"], L["py"], L["pz"])
    denom = _dot(d, ldir)
    t = _ray_plane_t_tile(o, d, pos, ldir)
    hit = _add(o, _scale(d, t))
    off = _sub(hit, pos)
    on_disk = _dot(off, off) <= L["radius"] * L["radius"]
    valid = on_disk & (jnp.abs(denom) > 1e-9) & (t > 0) & (L["radius"] > 0)
    return jnp.where(valid, t, _BIG)


def _ray_sphere_t_tile(o, d, L):
    op = (L["px"] - o[0], L["py"] - o[1], L["pz"] - o[2])
    b = _dot(op, d)
    det = L["radius"] * L["radius"] - (_dot(op, op) - b * b)
    sqrt_det = jnp.sqrt(_gsafe(det))
    t = jnp.where(b - sqrt_det > 0, b - sqrt_det, b + sqrt_det)
    return jnp.where((det >= 0) & (t > 0) & (L["radius"] > 0), t, _BIG)


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------

def _make_kernel(cfg):
    """cfg: dict with static scene/settings facts (see _pack_scene)."""
    n_tris = cfg["n_tris"]
    n_mats = cfg["n_mats"]
    light_kinds = cfg["light_kinds"]          # tuple of ints (static)
    n_lights = len(light_kinds)
    n_iters = cfg["n_iters"]
    max_bounce = cfg["max_bounce"]
    ris_count = cfg["ris_count"]
    firefly_clamp = cfg["firefly_clamp"]
    delta_light_clamp = cfg["delta_light_clamp"]
    # Texture/coverage scope (static): mat_tex[k] = (tr_tex, cov_tex,
    # is_cutout) per material; tex_meta[i] = flattened-table metadata.
    mat_tex = cfg.get("mat_tex", ((-1, -1, 0),) * n_mats)
    tex_meta = cfg.get("tex_meta", ())
    shadow_steps = cfg.get("shadow_steps", 0)   # 0 = binary any-hit shadows
    env_meta = cfg.get("env_meta")              # None = tint-only background
    env_nee = bool(env_meta and env_meta[5])
    has_coat = cfg.get("has_coat", False)       # any material coats
    has_diffuse = 1 in cfg.get("models_present", (0,))
    used_tex = sorted({b for mt in mat_tex for b in mt[:2] if b >= 0})
    any_cov = shadow_steps > 0 or any(
        mt[1] >= 0 or mt[2] for mt in mat_tex)
    hier = cfg.get("hier", False)
    DIM_NEE, DIM_BSDF, PER_BOUNCE = 1, 2, 8

    def kernel(*refs):
        if hier:
            (acc_ref, eps_ref, envt_ref, mats_ref, lights_ref, meta_ref,
             tri_hbm, attr_hbm, boxes_ref, rho_ggx_ref, rho_fres_ref,
             tex_ref, env_img_ref, env_pdf_ref, env_pool_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             hash_ref, act_ref, r_out, g_out, b_out, rays_out,
             stack_ref, tri_buf, attr_buf, ts_ref, ps_ref, us_ref, vs_ref,
             as_ref, sem_t, sem_a) = refs
            trace_closest, trace_any = _hier_tracers(
                boxes_ref, meta_ref, tri_hbm, attr_hbm, stack_ref,
                tri_buf, attr_buf, ts_ref, ps_ref, us_ref, vs_ref,
                as_ref, sem_t, sem_a)
        else:
            (acc_ref, eps_ref, envt_ref, mats_ref, lights_ref,
             tri_ref, attr_ref, rho_ggx_ref, rho_fres_ref, tex_ref,
             env_img_ref, env_pdf_ref, env_pool_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             hash_ref, act_ref, r_out, g_out, b_out, rays_out) = refs

            def trace_closest(o, d, t_min, t_max, want_attrs=True):
                t, p, u, v = _trace(tri_ref, n_tris, o, d, t_min, t_max)
                attrs = _fetch_attrs(attr_ref, p) if want_attrs else None
                return t, p, u, v, attrs

            def trace_any(o, d, t_min, t_max):
                return _trace_any(tri_ref, n_tris, o, d, t_min, t_max)

        accumulation = acc_ref[0]
        eps = eps_ref[0]
        origin = (ox_ref[...], oy_ref[...], oz_ref[...])
        direction = (dx_ref[...], dy_ref[...], dz_ref[...])
        pixel_hash = hash_ref[...]
        active = act_ref[...]                                    # f32 0/1
        zero = jnp.zeros_like(active)
        one = jnp.ones_like(active)
        throughput = (one, one, one)
        radiance = (zero, zero, zero)
        bsdf_pdf = zero
        bsdf_was_delta = one       # primary bounce: no MIS on first hit
        bounce = jnp.zeros_like(pixel_hash)                      # u32
        rays = zero

        def step(it, carry):
            (origin, direction, throughput, radiance, bsdf_pdf,
             bsdf_was_delta, bounce, active, rays) = carry
            live = active > 0.0
            rays = rays + jnp.where(live, 2.0, 0.0)
            eps_tile = jnp.full(LANES, 1.0, jnp.float32) * eps

            # Dead lanes get t_max = 0 on the hier path so their rays never
            # pass a box probe (drained iterations cost ~one root test per
            # row); the dense trace is flat-rate and keeps t_max = inf.
            tmax_main = (jnp.where(live, _BIG, 0.0) if hier else None)
            t_hit, prim, hu, hv, attrs = trace_closest(
                origin, direction, eps_tile, tmax_main, want_attrs=True)
            hit_mask = prim >= 0.0

            # analytic sphere-light intersection (unrolled)
            t_light = jnp.full(LANES, _BIG, jnp.float32)
            light_idx = jnp.full(LANES, -1.0, jnp.float32)
            for k, kind in enumerate(light_kinds):
                if kind == LIGHT_SPHERE:
                    Lk = _light_columns(lights_ref, k)
                    tk = _ray_sphere_t_tile(origin, direction, Lk)
                elif kind == LIGHT_SPOT:
                    Lk = _light_columns(lights_ref, k)
                    tk = _ray_spot_disk_t_tile(origin, direction, Lk)
                else:
                    continue
                closer = tk < t_light
                t_light = jnp.where(closer, tk, t_light)
                light_idx = jnp.where(closer, np.float32(k), light_idx)

            light_first = t_light < t_hit
            mesh_hit = live & hit_mask & ~light_first
            light_hit = live & light_first & (light_idx >= 0.0)
            miss = live & ~hit_mask & ~light_first

            # --- miss: environment (map w/ MIS, or flat tint) ---
            envt = (envt_ref[0], envt_ref[1], envt_ref[2])
            if env_meta is not None:
                env_rad = _env_evaluate(env_img_ref, env_meta, envt,
                                        direction)
                e_pdf = _env_pdf(env_pdf_ref, env_meta, direction)
                w_env = jnp.where(bsdf_pdf > 0.0,
                                  _mis_weight(bsdf_pdf, e_pdf), 1.0)
                env_rad = _scale(env_rad, w_env)
            else:
                env_rad = (envt[0] * one, envt[1] * one, envt[2] * one)
            radiance = _add(radiance, _where3(
                miss, _mul(throughput, env_rad), (zero, zero, zero)))

            # --- analytic light hit with MIS ---
            if any(k in (LIGHT_SPHERE, LIGHT_SPOT) for k in light_kinds):
                l_rad = (zero, zero, zero)
                l_pdf = zero
                for k, kind in enumerate(light_kinds):
                    Lk = _light_columns(lights_ref, k)
                    if kind == LIGHT_SPHERE:
                        ev = _sphere_light_evaluate(Lk)
                        ev = (ev[0] * one, ev[1] * one, ev[2] * one)
                        pk = _sphere_light_pdf(Lk, origin, direction)
                    elif kind == LIGHT_SPOT:
                        ev = _spot_light_evaluate(Lk, origin, direction)
                        pk = _spot_light_pdf(Lk, origin, direction)
                    else:
                        continue
                    sel = light_idx == np.float32(k)
                    l_rad = _where3(sel, ev, l_rad)
                    l_pdf = jnp.where(sel, pk, l_pdf)
                use_mis = bsdf_pdf > 0.0
                w = jnp.where(use_mis, _mis_weight(bsdf_pdf, l_pdf), 1.0)
                clamped = (jnp.minimum(throughput[0], firefly_clamp),
                           jnp.minimum(throughput[1], firefly_clamp),
                           jnp.minimum(throughput[2], firefly_clamp))
                radiance = _add(radiance, _where3(
                    light_hit, _scale(_mul(clamped, l_rad), w),
                    (zero, zero, zero)))

            # --- mesh-hit attributes (fetched by trace_closest above) ---
            bary0 = 1.0 - hu - hv
            n0 = (attrs[0], attrs[1], attrs[2])
            n1 = (attrs[3], attrs[4], attrs[5])
            n2 = (attrs[6], attrs[7], attrs[8])
            mat_idx = attrs[9]
            geo_n = (attrs[10], attrs[11], attrs[12])
            shading_n = _normalize(_add(
                _add(_scale(n0, bary0), _scale(n1, hu)), _scale(n2, hv)))
            t_safe = jnp.where(hit_mask, t_hit, 0.0)
            position = _add(origin, _scale(direction, t_safe))

            # --- material select-scan (SMEM scalars) ---
            m_tint = (zero, zero, zero)
            m_rough = zero
            m_spec = zero
            m_metal = zero
            m_thin = zero
            m_emis = (zero, zero, zero)
            m_cov = one
            m_coat = zero
            m_coat_r = zero
            m_model = zero
            for k in range(n_mats):
                sel = mat_idx == np.float32(k)
                m_tint = _where3(sel, (mats_ref[k, 0] * one,
                                       mats_ref[k, 1] * one,
                                       mats_ref[k, 2] * one), m_tint)
                m_rough = jnp.where(sel, mats_ref[k, 3], m_rough)
                m_spec = jnp.where(sel, mats_ref[k, 4], m_spec)
                m_metal = jnp.where(sel, mats_ref[k, 5], m_metal)
                m_thin = jnp.where(sel, mats_ref[k, 6], m_thin)
                m_emis = _where3(sel, (mats_ref[k, 7] * one,
                                       mats_ref[k, 8] * one,
                                       mats_ref[k, 9] * one), m_emis)
                if any_cov:
                    m_cov = jnp.where(sel, mats_ref[k, 10], m_cov)
                if has_coat:
                    m_coat = jnp.where(sel, mats_ref[k, 11], m_coat)
                    m_coat_r = jnp.where(sel, mats_ref[k, 12], m_coat_r)
                if has_diffuse:
                    m_model = jnp.where(sel, mats_ref[k, 13], m_model)
            thin_walled = m_thin > 0.5

            # --- textures (one-hot MXU fetch per distinct binding) ---
            if used_tex:
                u_uv = attrs[13] * bary0 + attrs[14] * hu + attrs[15] * hv
                v_uv = attrs[16] * bary0 + attrs[17] * hu + attrs[18] * hv
                tex_rgba = {b: _tex_fetch_nearest(tex_ref, tex_meta[b],
                                                  u_uv, v_uv)
                            for b in used_tex}
                tex_mul = (one, one, one)
                tex_rough = one
                for k, (tr_b, _cv, _cut) in enumerate(mat_tex):
                    if tr_b < 0:
                        continue
                    sel = mat_idx == np.float32(k)
                    tr = tex_rgba[tr_b]
                    tex_mul = _where3(sel, (tr[0], tr[1], tr[2]), tex_mul)
                    tex_rough = jnp.where(sel, tr[3], tex_rough)
                m_tint = _mul(m_tint, tex_mul)
                m_rough = m_rough * tex_rough
            else:
                tex_rgba = {}

            def coverage_lanes(mat_idx_c, cov_base, u_c, v_c):
                """Per-lane coverage with cutout binarization — the
                in-kernel mirror of _surface_material_params' coverage
                path (path_tracer.py). cov_base = material coverage or
                cutout threshold per lane."""
                cov = cov_base
                for k, (_tr, cov_b, is_cut) in enumerate(mat_tex):
                    if cov_b < 0 and not is_cut:
                        continue
                    sel = mat_idx_c == np.float32(k)
                    if cov_b >= 0:
                        samp = _tex_fetch_nearest(tex_ref, tex_meta[cov_b],
                                                  u_c, v_c)[0]
                    else:
                        samp = one
                    if is_cut:
                        ck = jnp.where(samp < cov_base, 0.0, 1.0)
                    else:
                        ck = cov_base * samp
                    cov = jnp.where(sel, ck, cov)
                return cov

            # --- RNG ---
            dim_bsdf = bounce * jnp.uint32(PER_BOUNCE) + jnp.uint32(DIM_BSDF)
            u_bsdf = _path_rng_4d(accumulation, pixel_hash, dim_bsdf)
            dim_nee = bounce * jnp.uint32(PER_BOUNCE) + jnp.uint32(DIM_NEE)
            u_nee = _path_rng_4d(accumulation, pixel_hash, dim_nee)

            hit_from_front = _dot(geo_n, direction) < 0.0
            backside_cull = ~hit_from_front & ~thin_walled
            if any_cov:
                cov = coverage_lanes(
                    mat_idx, m_cov,
                    attrs[13] * bary0 + attrs[14] * hu + attrs[15] * hv,
                    attrs[16] * bary0 + attrs[17] * hu + attrs[18] * hv)
                discard_cov = cov < u_bsdf[3]
                passthrough = mesh_hit & (backside_cull | discard_cov)
                shade = mesh_hit & ~backside_cull & ~discard_cov
            else:
                passthrough = mesh_hit & backside_cull
                shade = mesh_hit & ~backside_cull

            gf = _where3(hit_from_front, geo_n, _scale(geo_n, -1.0))
            sn = _where3(hit_from_front, shading_n, _scale(shading_n, -1.0))
            # fix_backfacing_shading_normal (Utils.h): target_cos 0.002
            wo_world = _scale(direction, -1.0)
            cos_w = _dot(wo_world, sn)
            fixed = _normalize(_sub(sn, _scale(wo_world, cos_w - 0.002)))
            sn = _where3(cos_w < 0.002, fixed, sn)

            wo = _to_local(wo_world, sn)
            cos_theta_o = jnp.where(hit_from_front | thin_walled,
                                    wo[2], -wo[2])

            sh = _shading_create(
                rho_ggx_ref, rho_fres_ref, m_tint, m_rough,
                m_spec, m_metal, jnp.abs(cos_theta_o),
                coat=m_coat if has_coat else None,
                coat_roughness=m_coat_r if has_coat else None)

            # surface emission
            radiance = _add(radiance, _where3(
                shade, _mul(throughput, m_emis), (zero, zero, zero)))

            # --- NEE with RIS over ris_count candidates ---
            res_dir = (zero, zero, zero)
            res_dist = zero
            res_rad = (zero, zero, zero)
            res_valid = zero
            n_nee_total = n_lights + (1 if env_nee else 0)
            if n_nee_total > 0 and ris_count > 0:
                for s in range(ris_count):
                    off = _RIS_OFFSETS[s]
                    c0 = _toroidal_shift(u_nee[0], off[0])
                    c1 = _toroidal_shift(u_nee[1], off[1])
                    c2 = _toroidal_shift(u_nee[2], off[2])
                    c3 = _toroidal_shift(u_nee[3], off[3])
                    pick = jnp.minimum(
                        jnp.floor(c2 * np.float32(n_nee_total)),
                        np.float32(n_nee_total - 1))
                    ls_dir = (zero, zero, zero)
                    ls_dist = zero
                    ls_rad = (zero, zero, zero)
                    ls_pdf = zero
                    ls_delta = zero
                    for k, kind in enumerate(light_kinds):
                        Lk = _light_columns(lights_ref, k)
                        if kind == LIGHT_SPHERE:
                            (kd, kdist, krad, kpdf,
                             kdelta) = _sphere_light_sample(
                                Lk, position, c0, c1)
                            kdelta_f = jnp.where(kdelta, 1.0, 0.0)
                        elif kind == LIGHT_SPOT:
                            (kd, kdist, krad, kpdf,
                             kdelta) = _spot_light_sample(
                                Lk, position, c0, c1)
                            kdelta_f = jnp.where(kdelta, 1.0, 0.0)
                        else:  # LIGHT_DIRECTIONAL
                            kd = (-Lk["dx"] * one, -Lk["dy"] * one,
                                  -Lk["dz"] * one)
                            kdist = jnp.full(LANES, 1e30, jnp.float32)
                            krad = (Lk["pwx"] * one, Lk["pwy"] * one,
                                    Lk["pwz"] * one)
                            kpdf = one
                            kdelta_f = one
                        sel = pick == np.float32(k)
                        ls_dir = _where3(sel, kd, ls_dir)
                        ls_dist = jnp.where(sel, kdist, ls_dist)
                        ls_rad = _where3(sel, krad, ls_rad)
                        ls_pdf = jnp.where(sel, kpdf, ls_pdf)
                        ls_delta = jnp.where(sel, kdelta_f, ls_delta)
                    if env_nee:
                        # Presampled-pool env candidate
                        # (presampled_environment_sample): index by c0.
                        n_pool = env_meta[4]
                        idx = jnp.clip(jnp.floor(c0 * np.float32(n_pool)),
                                       0.0, np.float32(n_pool - 1))
                        got = _fetch_2d(env_pool_ref, idx, 0,
                                        env_meta[8], 7)
                        sel = pick == np.float32(n_lights)
                        ls_dir = _where3(sel, (got[0], got[1], got[2]),
                                         ls_dir)
                        ls_dist = jnp.where(
                            sel, jnp.full(LANES, 1e30, jnp.float32),
                            ls_dist)
                        ls_rad = _where3(sel, (got[3], got[4], got[5]),
                                         ls_rad)
                        ls_pdf = jnp.where(sel, got[6], ls_pdf)
                        ls_delta = jnp.where(sel, 0.0, ls_delta)
                    # uniform light pick + |N·L|/pdf + MIS + material f
                    cand = _scale(ls_rad, np.float32(n_nee_total))
                    n_dot_l = _dot(sn, ls_dir)
                    safe_pdf = jnp.maximum(ls_pdf, 1e-12)
                    cand = _scale(cand, jnp.abs(n_dot_l) / safe_pdf)
                    cand = _where3(ls_pdf > 0.0, cand, (zero, zero, zero))
                    wi_c = _to_local(ls_dir, sn)
                    f_c, bsdf_pdf_c = _model_evaluate_with_pdf(
                        sh, m_tint, m_rough, m_model, has_diffuse, wo, wi_c)
                    is_d = ls_delta > 0.5
                    w = jnp.where(is_d, 1.0,
                                  _mis_weight(ls_pdf, bsdf_pdf_c))
                    f_c = _where3(is_d,
                                  (jnp.minimum(f_c[0], delta_light_clamp),
                                   jnp.minimum(f_c[1], delta_light_clamp),
                                   jnp.minimum(f_c[2], delta_light_clamp)),
                                  f_c)
                    cand = _scale(_mul(cand, f_c), w)
                    cand_valid = jnp.where(ls_pdf > 1e-6, 1.0, 0.0)
                    # reservoir update (path_tracer._reestimated_light_samples)
                    w_old = res_rad[0] + res_rad[1] + res_rad[2]
                    w_new = cand[0] + cand[1] + cand[2]
                    any_w = w_old + w_new > 0.0
                    p_new = w_new / jnp.where(any_w, w_old + w_new, 1.0)
                    take = c3 < p_new
                    res_dir = _where3(take, ls_dir, res_dir)
                    res_dist = jnp.where(take, ls_dist, res_dist)
                    res_valid = jnp.where(take, cand_valid, res_valid)
                    denom = jnp.where(take, p_new, 1.0 - p_new)
                    denom = jnp.where(any_w & (denom > 1e-20), denom, 1.0)
                    kept = _scale(_where3(take, cand, res_rad), 1.0 / denom)
                    res_rad = _where3(any_w, kept, (zero, zero, zero))
                res_rad = _scale(res_rad, np.float32(1.0 / ris_count))

                l_radiance = _mul(res_rad, throughput)
                side = jnp.where(_dot(res_dir, gf) >= 0.0, 1.0, -1.0)
                shadow_origin = _offset_ray_origin(position, _scale(gf, side))
                has_light = shade & (_max3(l_radiance) > 0.0)
                if shadow_steps > 0:
                    # Coverage-aware shadow march — the in-kernel mirror of
                    # path_tracer._shadow_transmittance: closest-hit up to
                    # ``shadow_steps`` times, throughput ×= (1−coverage),
                    # advance past each surface; leftovers fully occlude.
                    trans = one
                    t_rem = res_dist * (1.0 - 1e-4)
                    s_o = shadow_origin
                    for sstep in range(shadow_steps):
                        last = sstep == shadow_steps - 1
                        t_s, p_s, su, sv, attrs_s = trace_closest(
                            s_o, res_dir, eps_tile, t_rem,
                            want_attrs=not last)
                        hit_s = p_s >= 0.0
                        blocked = hit_s & (trans > 0.0)
                        if last:
                            trans = jnp.where(blocked, 0.0, trans)
                            break
                        sb0 = 1.0 - su - sv
                        cov_s = coverage_lanes(
                            attrs_s[9],
                            _material_coverage(mats_ref, attrs_s[9], one),
                            attrs_s[13] * sb0 + attrs_s[14] * su
                            + attrs_s[15] * sv,
                            attrs_s[16] * sb0 + attrs_s[17] * su
                            + attrs_s[18] * sv)
                        trans = jnp.where(blocked, trans * (1.0 - cov_s),
                                          trans)
                        advance = jnp.where(hit_s, t_s, 0.0) + eps
                        s_o = _add(s_o, _scale(res_dir, advance))
                        t_rem = t_rem - advance
                else:
                    occluded = trace_any(shadow_origin, res_dir, eps_tile,
                                         res_dist * (1.0 - 1e-4))
                    trans = jnp.where(occluded, 0.0, 1.0)
                radiance = _add(radiance, _where3(
                    has_light, _scale(l_radiance, trans), (zero, zero, zero)))
            nee_valid = res_valid > 0.5

            # --- BSDF sampling ---
            wi, s_pdf, s_delta, s_f = _model_sample(
                sh, m_tint, m_rough, m_model, has_diffuse, wo,
                u_bsdf[0], u_bsdf[1], u_bsdf[2])
            new_dir = _to_world(wi, sn)
            is_reflection = wi[2] >= 0.0
            cos_geo = _dot(new_dir, gf)
            # Boolean algebra, not where(cond, bool, bool): Mosaic cannot
            # legalize selects over vector<i1> operands (cf. pallas_smallpt).
            wrong_side = ((is_reflection & (cos_geo < 0.0))
                          | (~is_reflection & (cos_geo >= 0.0)))
            new_dir = _where3(wrong_side, _reflect(new_dir, gf), new_dir)

            valid_sample = s_pdf > 0.0
            weight = jnp.abs(wi[2]) / jnp.maximum(s_pdf, 1e-12)
            new_T = _scale(_mul(throughput, s_f), weight)
            new_T = _where3(valid_sample, new_T, (zero, zero, zero))
            b_side = jnp.where(_dot(new_dir, gf) >= 0.0, 1.0, -1.0)
            new_origin = _offset_ray_origin(position, _scale(gf, b_side))
            new_bsdf_pdf = jnp.where(s_delta | ~nee_valid, 0.0, s_pdf)

            # --- combine lane updates ---
            pass_origin = _offset_ray_origin(position, _scale(gf, -1.0))
            origin = _where3(shade, new_origin,
                             _where3(passthrough, pass_origin, origin))
            direction = _where3(shade, new_dir, direction)
            throughput = _where3(shade, new_T, throughput)
            bsdf_pdf = jnp.where(shade, new_bsdf_pdf, bsdf_pdf)
            bsdf_was_delta = jnp.where(shade, jnp.where(s_delta, 1.0, 0.0),
                                       bsdf_was_delta)
            bounce = jnp.where(shade, bounce + jnp.uint32(1), bounce)
            still = jnp.where(shade, jnp.where(_max3(throughput) > 0.0,
                                               1.0, 0.0), 1.0)
            active = jnp.where(
                live & ~miss & ~light_hit & (still > 0.0)
                & (bounce <= jnp.uint32(max_bounce)), 1.0, 0.0)
            return (origin, direction, throughput, radiance, bsdf_pdf,
                    bsdf_was_delta, bounce, active, rays)

        carry = (origin, direction, throughput, radiance, bsdf_pdf,
                 bsdf_was_delta, bounce, active, rays)
        carry = jax.lax.fori_loop(0, n_iters, step, carry)
        radiance = carry[3]
        r_out[...] = radiance[0]
        g_out[...] = radiance[1]
        b_out[...] = radiance[2]
        rays_out[...] = carry[8]

    return kernel


# ---------------------------------------------------------------------------
# Packing + eligibility + entry point
# ---------------------------------------------------------------------------

_PACK_CACHE = {}


def megakernel_ineligibility_reasons(scene: RenderScene,
                                     settings: RenderSettings) -> list:
    """Every feature of this scene/settings combination that falls outside
    the megakernel's scope, as human-readable strings (empty = eligible).

    This is the observable form of the eligibility gate (VERDICT r4 #6):
    `explain_render_path` and the viewer panel surface it so the 10×
    megakernel↔wavefront cliff is legible instead of silent."""
    reasons = []
    try:
        t = int(scene.tri_verts.shape[0])
        if t == 0:
            reasons.append("empty scene")
        elif t > HIER_MAX_TRIS:
            reasons.append(f"{t} triangles > HIER_MAX_TRIS {HIER_MAX_TRIS}")
        if scene.environment is not None:
            env = scene.environment
            h, w = int(env.image.shape[0]), int(env.image.shape[1])
            if h * w > MAX_ENV_TEXELS:
                reasons.append(f"environment map {h}x{w} > MAX_ENV_TEXELS "
                               f"{MAX_ENV_TEXELS}")
            ph, pw = env.pdf_size
            if int(ph) * int(pw) > MAX_ENV_PDF:
                reasons.append(f"environment pdf grid {ph}x{pw} > "
                               f"MAX_ENV_PDF {MAX_ENV_PDF}")
            pool = scene.environment_presampled
            if pool is None:
                reasons.append("environment without presampled pool "
                               "(build_render_scene presample_environment)")
            elif pool.sample_count > MAX_ENV_POOL:
                reasons.append(f"environment pool {pool.sample_count} > "
                               f"MAX_ENV_POOL {MAX_ENV_POOL}")
            if not settings.use_presampled_environment:
                reasons.append("CDF-search environment NEE "
                               "(use_presampled_environment=False)")
        mats = scene.materials
        if mats.count == 0 or mats.count > MAX_MATERIALS:
            reasons.append(f"{mats.count} materials outside "
                           f"[1, {MAX_MATERIALS}]")
        if bool(np.any(np.asarray(mats.shading_model) == 2)):
            reasons.append("Transmissive shading model")
        if bool(np.any(np.asarray(mats.metallic_texture) >= 0)):
            reasons.append("metallic textures")
        # Tint-roughness / coverage textures ARE in scope when the bank's
        # level-0 texels fit the one-hot fetch budget and every BOUND
        # texture uses NEAREST filtering (the target class: procedural
        # checkers + cutout grids, Opacity.h / Utils.cpp).
        bound = set()
        for tex in (np.asarray(mats.tint_roughness_texture),
                    np.asarray(mats.coverage_texture)):
            bound |= {int(b) for b in tex if b >= 0}
        if bound:
            from bifrost3d_tpu.io.texture import FILTER_NONE
            bank = scene.textures
            if bank.count == 0:
                reasons.append("texture bindings without a texture bank")
            else:
                sizes = np.asarray(bank.sizes)
                total = int((sizes[:, 0] * sizes[:, 1]).sum())
                if total > MAX_TEX_TEXELS:
                    reasons.append(
                        f"{total} texels > MAX_TEX_TEXELS {MAX_TEX_TEXELS}")
                filters = np.asarray(bank.filters)
                if any(int(filters[b]) != FILTER_NONE for b in bound):
                    reasons.append("non-nearest texture filtering")
        if not bool(np.all(np.asarray(scene.tri_tint_roughness) == 1.0)):
            reasons.append("per-vertex tint-roughness")
        kinds = np.asarray(scene.lights.kind)
        if kinds.shape[0] > MAX_LIGHTS:
            reasons.append(f"{kinds.shape[0]} lights > MAX_LIGHTS "
                           f"{MAX_LIGHTS}")
        if not bool(np.all((kinds == LIGHT_SPHERE)
                           | (kinds == LIGHT_DIRECTIONAL)
                           | (kinds == LIGHT_SPOT))):
            reasons.append("unknown light kind")
        if settings.path_regularization_scale > 0.0:
            reasons.append("path regularization")
        if settings.next_event_sample_count > 8:
            reasons.append(f"RIS count {settings.next_event_sample_count} > 8")
        return reasons
    except (AttributeError, TypeError, jax.errors.TracerArrayConversionError):
        # Traced scenes (render_sample_fast under a caller's jit) cannot be
        # inspected — fall back to the wavefront.
        return ["scene is traced (cannot inspect under jit)"]


def mesh_megakernel_eligible(scene: RenderScene,
                             settings: RenderSettings) -> bool:
    """Static gate: True when the scene/settings combination is within this
    kernel's scope (see module docstring). Everything else renders
    through the XLA wavefront."""
    return not megakernel_ineligibility_reasons(scene, settings)


def _pack_scene(scene: RenderScene):
    """Host-side GEOMETRY tables for the kernel, cached per scene identity.

    Only the O(t) geometry-derived tables live in the cache, keyed on the
    identity of every source array they are built from.  Material, light,
    environment-tint and epsilon values are deliberately NOT cached here:
    incremental SceneSync edits them via ``_replace`` without changing
    geometry identity, so the dispatcher reads them from the live scene on
    every call (r4 advisor finding: the old pack served a stale env tint
    after a roots edit)."""
    key = (id(scene.tri_verts), id(scene.tri_normals_oct),
           id(scene.tri_material))
    if key in _PACK_CACHE:
        return _PACK_CACHE[key]
    if len(_PACK_CACHE) > 32:
        _PACK_CACHE.clear()   # viewer-session bound; scenes are rebuilt rarely
    if isinstance(scene.tri_verts, jax.core.Tracer):
        raise RuntimeError(
            "render_mesh_megakernel was traced with a scene whose geometry "
            "was never packed: run one eager dispatch (or "
            "prewarm_megakernel(scene)) before jitting over it")
    tv = np.asarray(scene.tri_verts, np.float32)        # [t, 3, 3]
    t = tv.shape[0]
    t_pad = max(8, ((t + 7) // 8) * 8)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    tri = np.zeros((t_pad, 16), np.float32)
    tri[:t, 0:3] = v0
    tri[:t, 3:6] = e1
    tri[:t, 6:9] = e2

    from bifrost3d_tpu.math.octahedral import octahedral_decode
    corner_n = np.asarray(octahedral_decode(scene.tri_normals_oct),
                          np.float32)                    # [t, 3, 3]
    geo_n = np.cross(e1, e2)
    geo_n /= np.maximum(np.linalg.norm(geo_n, axis=-1, keepdims=True), 1e-20)
    attr = np.zeros((ATTR_ROWS, t_pad), np.float32)
    attr[0:9, :t] = corner_n.reshape(t, 9).T
    attr[9, :t] = np.asarray(scene.tri_material, np.float32)
    attr[10:13, :t] = geo_n.T
    # Rows 13-18: per-corner texcoords (u0,u1,u2,v0,v1,v2).
    uvs = np.asarray(scene.tri_uvs, np.float32)          # [t, 3, 2]
    attr[13:16, :t] = uvs[:, :, 0].T
    attr[16:19, :t] = uvs[:, :, 1].T

    if t > MAX_TRIS:
        # Hier path: cluster-ordered slot tables from the shared
        # pack_hierarchical product (reuses the wavefront's packing when
        # the scene carries one). Slot-major triangles [T_pad, 16] for
        # the leaf DMA, attrs re-gathered into slot order.
        from bifrost3d_tpu.geometry.pallas_bvh import pack_hierarchical
        hp = pack_hierarchical(tv, scene.bvh, cluster_t=HIER_CLUSTER)
        order = np.asarray(hp.order)
        attr_slot = np.ascontiguousarray(attr[:, order])
        # Slot-major [T_pad, 128] triangle table (components in lanes 0-8):
        # the 128-lane padding buys a lane-ALIGNED leaf DMA slice and
        # transpose-free (C, 1) component columns in the kernel — HBM is
        # cheap (65k tris = 33 MB), lane-misaligned slices don't compile,
        # and in-kernel transposes burn VPU issues.
        comp = np.asarray(hp.tri_components, np.float32)   # [16, T_pad]
        t_slots = comp.shape[1]
        tri_slot = np.zeros((t_slots, 128), np.float32)
        tri_slot[:, 0:9] = comp[0:9].T
        # Node boxes as (6, n_pad) SMEM scalars (lo.xyz rows 0-2, hi.xyz
        # rows 3-5): probes read per-node scalars and splat against the
        # full (8, 128) ray tiles.
        boxes6 = np.ascontiguousarray(
            np.asarray(hp.node_boxes, np.float32)[:, 0:6].T)
        packed = dict(
            _pins=(scene.tri_verts, scene.tri_normals_oct,
                   scene.tri_material),
            tri=jnp.asarray(tri_slot), attr=jnp.asarray(attr_slot),
            boxes=jnp.asarray(boxes6), meta=hp.node_meta,
            n_tris=t_slots, hier=True,
        )
        _PACK_CACHE[key] = packed
        return packed

    packed = dict(
        # Pin the keyed arrays: id()-keyed caching is only sound while the
        # originals stay alive (a GC'd array's id can be reused).
        _pins=(scene.tri_verts, scene.tri_normals_oct, scene.tri_material),
        tri=jnp.asarray(tri), attr=jnp.asarray(attr), n_tris=t,
        boxes=None, meta=None, hier=False,
    )
    _PACK_CACHE[key] = packed
    return packed


def _pack2d(flat_attrs):
    """[N, A] numpy → ((A*R, 128) table, R) with R = ceil(N/128) — the
    _fetch_2d layout: attribute a's value for flat index i sits at
    [a*R + i//128, i%128]."""
    n, a_cnt = flat_attrs.shape
    r = max(1, (n + 127) // 128)
    out = np.zeros((a_cnt * r, 128), np.float32)
    padded = np.zeros((r * 128, a_cnt), np.float32)
    padded[:n] = flat_attrs
    for a in range(a_cnt):
        out[a * r:(a + 1) * r] = padded[:, a].reshape(r, 128)
    rows_pad = ((out.shape[0] + 7) // 8) * 8
    return np.pad(out, ((0, rows_pad - out.shape[0]), (0, 0))), r


_ENV_CACHE = {}
MAX_ENV_TEXELS = 4096    # latlong radiance map budget (h*w)
MAX_ENV_PDF = 8192       # pdf grid budget (ph*pw; 128-row min → 128×64 max)
MAX_ENV_POOL = 8192      # presampled pool entries


def _pack_env(scene: RenderScene):
    """Environment tables for the kernel: flattened latlong radiance
    (8, hw_pad; rows 0-2 rgb), per-pixel pdf (8, n_pad; row 0), and the
    presampled NEE pool (8, n_pad; rows 0-2 direction, 3-5 radiance,
    6 pdf) + static meta (w, h, pw, ph, n_pool, nee_enabled). Cached per
    environment identity."""
    env = scene.environment
    dummy = np.zeros((8, 128), np.float32)
    if env is None:
        return dummy, dummy, dummy, None
    key = id(env.image)
    if key in _ENV_CACHE:
        e = _ENV_CACHE[key]
        return e[0], e[1], e[2], e[3]
    if len(_ENV_CACHE) > 16:
        _ENV_CACHE.clear()
    img = np.asarray(env.image, np.float32)              # [h, w, 3]
    h, w = img.shape[0], img.shape[1]
    img_tab, r_img = _pack2d(img.reshape(h * w, 3))

    pdf = np.asarray(env.per_pixel_pdf, np.float32)      # [ph, pw]
    ph, pw = pdf.shape
    pdf_tab, r_pdf = _pack2d(pdf.reshape(-1, 1))

    pool = scene.environment_presampled
    if pool is not None and pool.nee_enabled:
        n_pool = pool.sample_count
        pool_flat = np.concatenate([
            np.asarray(pool.directions, np.float32),
            np.asarray(pool.radiances, np.float32),
            np.asarray(pool.pdfs, np.float32)[:, None]], axis=1)  # [n, 7]
        pool_tab, r_pool = _pack2d(pool_flat)
    else:
        n_pool = 0
        pool_tab, r_pool = dummy, 1
    meta = (w, h, pw, ph, n_pool, n_pool > 1, r_img, r_pdf, r_pool)
    _ENV_CACHE[key] = (img_tab, pdf_tab, pool_tab, meta, env.image)
    return img_tab, pdf_tab, pool_tab, meta


_TEX_CACHE = {}


def _pack_textures(scene: RenderScene):
    """Flatten every texture's level 0 into one (8, N_pad) VMEM table for
    one-hot MXU fetches → (table, tex_meta) with
    tex_meta[i] = (base, width, height, wrap_u, wrap_v, filter) as static
    python ints. Cached per bank identity."""
    bank = scene.textures
    n = bank.count
    if n == 0:
        return np.zeros((8, 128), np.float32), ()
    key = id(bank.data)
    if key in _TEX_CACHE:
        return _TEX_CACHE[key][0], _TEX_CACHE[key][1]
    if len(_TEX_CACHE) > 16:
        _TEX_CACHE.clear()
    data = np.asarray(bank.data, np.float32)     # [n, atlas_h, max_w, 4]
    sizes = np.asarray(bank.sizes)               # [n, 2] (h, w) level 0
    filters = np.asarray(bank.filters)
    wraps = np.asarray(bank.wraps)
    metas = []
    blocks = []
    base_row = 0
    for i in range(n):
        h, w = int(sizes[i, 0]), int(sizes[i, 1])
        block, r = _pack2d(data[i, :h, :w, :].reshape(h * w, 4))
        blocks.append(block)
        metas.append((base_row, w, h, int(wraps[i, 0]), int(wraps[i, 1]),
                      int(filters[i]), r))
        base_row += block.shape[0]
    tab = np.concatenate(blocks, axis=0)         # [(Σ 4*R_i)_pad8, 128]
    meta = tuple(metas)
    _TEX_CACHE[key] = (tab, meta, bank.data)     # pin the keyed array
    return tab, meta


def _live_tables(scene: RenderScene):
    """Material/light tables rebuilt from the LIVE scene on every dispatch.

    Built with jnp ops so they stay correct BOTH for concrete scenes and
    under a caller's jit (newer JAX lifts closure constants to tracers —
    a host-side numpy pack would raise TracerArrayConversionError on a
    cache miss inside jit). Tiny (≤ MAX_MATERIALS×12 f32): the rebuild
    guarantees ``_replace``-style scene edits (env tint, material fields,
    light power …) are visible immediately (r4 advisor finding)."""
    mats = scene.materials
    m = mats.count
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    if m:
        # Cutouts are implicitly thin-walled (Types.h:384: is_thin_walled()
        # tests Cutout | ThinWalled), so flags 1 and 2 both set column 6.
        thin = ((jnp.asarray(mats.flags) & 3) != 0).astype(jnp.float32)
        mat_tab = jnp.concatenate([
            f32(mats.tint).reshape(m, 3),
            f32(mats.roughness).reshape(m, 1),
            f32(mats.specularity).reshape(m, 1),
            f32(mats.metallic).reshape(m, 1),
            thin.reshape(m, 1),
            f32(mats.emission).reshape(m, 3),
            # Coverage — or the cutout threshold (shared storage,
            # Material.h:84-85).
            f32(mats.coverage).reshape(m, 1),
            f32(mats.coat).reshape(m, 1),
            f32(mats.coat_roughness).reshape(m, 1),
            f32(mats.shading_model).reshape(m, 1),
            jnp.zeros((m, 2), jnp.float32),
        ], axis=1)
    else:
        mat_tab = jnp.zeros((1, 16), jnp.float32)

    lights = scene.lights
    n_l = lights.count
    if n_l:
        light_tab = jnp.concatenate([
            f32(lights.position).reshape(n_l, 3),
            f32(lights.radius).reshape(n_l, 1),
            f32(lights.power).reshape(n_l, 3),
            f32(lights.direction).reshape(n_l, 3),
            f32(lights.cos_angle).reshape(n_l, 1),
            jnp.zeros((n_l, 1), jnp.float32),
        ], axis=1)
    else:
        light_tab = jnp.zeros((1, 12), jnp.float32)
    return mat_tab, m, light_tab


_STATIC_CACHE = {}


def _static_info(scene: RenderScene):
    """Kernel-structure statics (light kinds, texture bindings, cutout
    flags) read host-side and cached per identity. These cannot be read
    from a traced scene — callers that jit over render_mesh_megakernel
    must run one eager dispatch (or prewarm_megakernel) first."""
    key = (id(scene.lights.kind), id(scene.materials.flags),
           id(scene.materials.tint_roughness_texture),
           id(scene.materials.coverage_texture), id(scene.materials.coat))
    if key in _STATIC_CACHE:
        return _STATIC_CACHE[key][0]
    if len(_STATIC_CACHE) > 32:
        _STATIC_CACHE.clear()
    try:
        mats = scene.materials
        info = dict(
            light_kinds=tuple(int(k) for k in np.asarray(scene.lights.kind)),
            mat_tex=tuple(
                (int(tr), int(cv), int(bool(fl & 2)))
                for tr, cv, fl in zip(
                    np.asarray(mats.tint_roughness_texture),
                    np.asarray(mats.coverage_texture),
                    np.asarray(mats.flags))),
            has_coat=bool(np.any(np.asarray(mats.coat) > 0.0)),
        )
    except jax.errors.TracerArrayConversionError as e:
        raise RuntimeError(
            "render_mesh_megakernel was traced with a scene whose static "
            "tables were never packed: run one eager dispatch (or "
            "prewarm_megakernel(scene)) before jitting over it") from e
    _STATIC_CACHE[key] = (info, (scene.lights.kind, scene.materials.flags,
                                 scene.materials.tint_roughness_texture,
                                 scene.materials.coverage_texture))
    return info


def prewarm_megakernel(scene: RenderScene) -> None:
    """Populate every host-side pack cache for ``scene`` so subsequent
    megakernel dispatches work from inside a caller's jit."""
    _pack_scene(scene)
    _pack_textures(scene)
    _pack_env(scene)
    _static_info(scene)


def _rho_tables():
    from bifrost3d_tpu.shading.fittings import get_fittings
    f = get_fittings()
    return (jnp.asarray(np.asarray(f.ggx, np.float32)),
            jnp.asarray(np.asarray(f.ggx_with_fresnel, np.float32)))


def render_mesh_megakernel(scene: RenderScene, camera, width: int,
                           height: int, accumulation,
                           settings: RenderSettings = RenderSettings(),
                           interpret: bool = False):
    """One progressive frame through the mesh megakernel →
    (radiance [height, width, 3], rays [] f32 — live lanes × 2/iteration,
    the same in-run tally the pooled wavefront reports).

    Geometry tables come from the per-identity pack cache; everything a
    SceneSync ``_replace`` edit can touch (materials, lights, env tint,
    epsilon) is read from the live scene on every dispatch."""
    packed = _pack_scene(scene)
    mat_tab, n_mats, light_tab = _live_tables(scene)
    rho_ggx, rho_fres = _rho_tables()
    tex_tab, tex_meta = _pack_textures(scene)
    env_img, env_pdf, env_pool, env_meta = _pack_env(scene)
    info = _static_info(scene)
    light_kinds = info["light_kinds"]
    mat_tex = info["mat_tex"]
    shadow_steps = (settings.shadow_coverage_steps
                    if settings.coverage_aware_shadows else 0)
    # With an environment map the tint slot carries the env's own tint
    # (environment_evaluate multiplies it); tint-only backgrounds keep
    # the scene-level environment_tint.
    tint = (scene.environment.tint if scene.environment is not None
            else scene.environment_tint)
    return _render_packed(
        packed["tri"], packed["attr"], jnp.asarray(mat_tab),
        jnp.asarray(light_tab), rho_ggx, rho_fres, jnp.asarray(tex_tab),
        jnp.asarray(env_img), jnp.asarray(env_pdf), jnp.asarray(env_pool),
        jnp.asarray(tint, jnp.float32),
        jnp.asarray(scene.scene_epsilon, jnp.float32).reshape(1),
        camera, accumulation,
        boxes=packed["boxes"], meta=packed["meta"],
        width=width, height=height,
        n_tris=packed["n_tris"], n_mats=n_mats,
        light_kinds=light_kinds, settings=settings,
        mat_tex=mat_tex, tex_meta=tex_meta, shadow_steps=shadow_steps,
        env_meta=env_meta, has_coat=info["has_coat"],
        hier=packed["hier"], interpret=interpret)


@partial(jax.jit, static_argnames=("width", "height", "n_tris", "n_mats",
                                   "light_kinds", "settings", "mat_tex",
                                   "tex_meta", "shadow_steps", "env_meta",
                                   "has_coat", "hier", "interpret"))
def _render_packed(tri, attr, mats, lights, rho_ggx, rho_fres, tex_tab,
                   env_img, env_pdf, env_pool,
                   env_tint, eps, camera, accumulation, *, boxes=None,
                   meta=None, width: int,
                   height: int, n_tris: int, n_mats: int, light_kinds: tuple,
                   settings: RenderSettings, mat_tex: tuple = (),
                   tex_meta: tuple = (), shadow_steps: int = 0,
                   env_meta=None, has_coat: bool = False,
                   hier: bool = False, interpret: bool = False):
    from bifrost3d_tpu.sampling.hashes import pcg2d
    from bifrost3d_tpu.sampling.sobol import Dimension, path_rng_4d
    from bifrost3d_tpu.scene.camera import camera_ray_directions

    accumulation = jnp.asarray(accumulation, jnp.uint32)

    n_pixels = width * height
    per_block = LANES[0] * LANES[1]
    # Pixel-to-block mapping: each (8, 128) block covers a square 32x32
    # image TILE, not 2 raster rows of 512 — square tiles keep a block's
    # rays (and their bounce footprints) spatially tight, which is what
    # the hier walk's block-granular culling feeds on (and is harmless
    # for the dense trace: per-pixel values are mapping-invariant).
    if hier:
        # Square 32x32 image tiles per (8,128) block: a block's rays (and
        # their bounce footprints) stay spatially tight, which feeds the
        # hier walk's block-granular culling. Static permutation
        # (width/height are jit statics) computed in numpy so the raster
        # unscramble below is a GATHER by a constant index vector — a
        # dynamic scatter costs ~4 ms/frame on TPU. The dense path keeps
        # the identity raster layout (its flat-rate trace gains nothing
        # and the remap measurably costs it).
        TILE = 32
        tiles_x = (width + TILE - 1) // TILE
        tiles_y = (height + TILE - 1) // TILE
        n_blocks = tiles_x * tiles_y
        flat_np = np.arange(n_blocks * per_block)
        b_np = flat_np // per_block
        k_np = flat_np % per_block
        x_np = (b_np % tiles_x) * TILE + k_np % TILE
        y_np = (b_np // tiles_x) * TILE + k_np // TILE
        in_range_np = (x_np < width) & (y_np < height)
        x_np = np.minimum(x_np, width - 1)
        y_np = np.minimum(y_np, height - 1)
        inv_np = np.zeros(n_pixels, np.int32)
        inv_np[(y_np * width + x_np)[in_range_np]] = flat_np[in_range_np]
        x = jnp.asarray(x_np, jnp.uint32)
        y = jnp.asarray(y_np, jnp.uint32)
        in_range = jnp.asarray(in_range_np)
        inv_perm = jnp.asarray(inv_np)
    else:
        n_blocks = (n_pixels + per_block - 1) // per_block
        flat = jnp.arange(n_blocks * per_block, dtype=jnp.uint32)
        in_range = flat < n_pixels
        safe = jnp.minimum(flat, n_pixels - 1)
        x = safe % width
        y = safe // width
        inv_perm = None
    pixel_hash, _ = pcg2d(x, y)
    u_cam = path_rng_4d(accumulation, pixel_hash, jnp.uint32(Dimension.CAMERA))
    jitter = jnp.where(accumulation == 0, 0.5, u_cam[..., :2])
    xf = (x.astype(jnp.float32) + jitter[..., 0]) / width
    yf = 1.0 - (y.astype(jnp.float32) + jitter[..., 1]) / height
    origin, direction = camera_ray_directions(
        camera, jnp.stack([xf, yf], axis=-1))
    active0 = (in_range & jnp.isfinite(origin[..., 0])).astype(jnp.float32)

    def tile(a, dtype=jnp.float32):
        return a.astype(dtype).reshape(n_blocks * LANES[0], LANES[1])

    block = pl.BlockSpec((LANES[0], LANES[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    cfg = dict(
        n_tris=n_tris, n_mats=n_mats,
        light_kinds=light_kinds,
        n_iters=settings.max_bounce_count + 1 + settings.passthrough_slack,
        max_bounce=settings.max_bounce_count,
        ris_count=settings.next_event_sample_count,
        firefly_clamp=settings.firefly_clamp,
        delta_light_clamp=settings.delta_light_clamp,
        mat_tex=mat_tex, tex_meta=tex_meta, shadow_steps=shadow_steps,
        env_meta=env_meta, has_coat=has_coat,
        models_present=settings.shading_models_present,
        hier=hier,
    )
    out_shape = [jax.ShapeDtypeStruct((n_blocks * LANES[0], LANES[1]),
                                      jnp.float32)] * 4
    ray_tiles = (
        tile(origin[..., 0]), tile(origin[..., 1]), tile(origin[..., 2]),
        tile(direction[..., 0]), tile(direction[..., 1]),
        tile(direction[..., 2]),
        tile(pixel_hash, jnp.uint32), tile(active0))
    if hier:
        anyspec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [smem, smem, smem, smem, smem, smem,
                    anyspec, anyspec, smem,
                    vmem, vmem, vmem,
                    vmem, vmem, vmem] + [block] * 8
        operands = (accumulation.reshape(1), eps, env_tint, mats, lights,
                    meta, tri, attr, boxes, rho_ggx, rho_fres, tex_tab,
                    env_img, env_pdf, env_pool) + ray_tiles
        scratch = [
            pltpu.SMEM((HIER_STACK,), jnp.int32),
            pltpu.VMEM((HIER_CLUSTER, 128), jnp.float32),   # tri DMA buf
            pltpu.VMEM((ATTR_ROWS, HIER_CLUSTER), jnp.float32),
            pltpu.VMEM(LANES, jnp.float32),                 # best t
            pltpu.VMEM(LANES, jnp.float32),                 # best prim
            pltpu.VMEM(LANES, jnp.float32),                 # best u
            pltpu.VMEM(LANES, jnp.float32),                 # best v
            pltpu.VMEM((ATTR_ROWS * 8, 128), jnp.float32),  # best attrs
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        in_specs = [smem, smem, smem, smem, smem,
                    vmem, vmem, vmem, vmem, vmem,
                    vmem, vmem, vmem] + [block] * 8
        operands = (accumulation.reshape(1), eps, env_tint, mats, lights,
                    tri, attr, rho_ggx, rho_fres, tex_tab,
                    env_img, env_pdf, env_pool) + ray_tiles
        scratch = []
    r, g, b, rays = pl.pallas_call(
        _make_kernel(cfg),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[block] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # Feature-heavy configs (968-tri trace + env pool fetches ×RIS in
        # one unrolled body) need more scoped VMEM than Mosaic's 16 MB
        # default budget; the deep-dive measured 19.9 MB peak.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    if inv_perm is not None:
        # Tile-order lanes gather back to raster order via the static
        # inverse permutation (OOB lanes never appear in inv_perm).
        img = jnp.stack([r.reshape(-1)[inv_perm], g.reshape(-1)[inv_perm],
                         b.reshape(-1)[inv_perm]], axis=-1)
    else:
        img = jnp.stack([r.reshape(-1)[:n_pixels], g.reshape(-1)[:n_pixels],
                         b.reshape(-1)[:n_pixels]], axis=-1)
    return img.reshape(height, width, 3), jnp.sum(rays)
