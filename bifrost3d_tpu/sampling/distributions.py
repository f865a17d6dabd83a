"""Monte-Carlo sampling distributions, wavefront-vectorized.

Counterpart of the reference's ``OptiXRenderer/Distributions.h`` and
``Math/Distributions.h`` (SURVEY.md §2.2, §2.4). Directions are in tangent
space (+z = shading normal) unless noted; all samplers take uniform random
pairs ``u2 [..., 2]`` in [0,1)^2 and return ``(direction [..., 3], pdf [...])``.
Branch-free jnp throughout — every branch of the reference becomes a
``jnp.where`` so one code path serves the whole ray pool on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.math.vec import lerp, normalize, reflect


def _gsafe(x, floor):
    """max with a gradient-safe floor: sqrt'(0) = inf would poison masked
    lanes in backward passes, so never let the operand reach exactly 0."""
    return jnp.maximum(x, jnp.maximum(floor, 1e-12))


def _gclip(x, lo, hi):
    return jnp.clip(x, jnp.maximum(lo, 1e-12), hi)


PI = np.float32(np.pi)
TWO_PI = np.float32(2.0 * np.pi)
INV_PI = np.float32(1.0 / np.pi)


# ---------------------------------------------------------------------------
# Disk
# ---------------------------------------------------------------------------

def concentric_disk_sample(u2, radius=1.0):
    """Concentric disk mapping (Ray Tracing Gems 16.5.1.2).

    Returns (xy [..., 2], pdf). Mirrors Distributions.h Disk::sample_concentric_mapping.
    """
    a = 2.0 * u2[..., 0] - 1.0
    b = 2.0 * u2[..., 1] - 1.0
    b = jnp.where(b == 0.0, 1.0, b)
    use_a = a * a > b * b
    r = jnp.where(use_a, a, b) * radius
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = b  # b != 0 by construction
    phi = jnp.where(
        use_a, (PI / 4) * (b / safe_a), (PI / 2) - (PI / 4) * (a / safe_b))
    xy = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
    pdf = jnp.broadcast_to(1.0 / (PI * radius * radius), r.shape)
    return xy, pdf


# ---------------------------------------------------------------------------
# Cone / sphere / hemisphere / cosine
# ---------------------------------------------------------------------------

def cone_pdf(cos_theta_max):
    return 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_theta_max, 1e-10))


def cone_sample(cos_theta_max, u2):
    """Uniform direction in a cone about +z with half-angle acos(cos_theta_max)."""
    cos_theta = (1.0 - u2[..., 0]) + u2[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(_gsafe(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * u2[..., 1]
    d = jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1)
    return d, jnp.broadcast_to(cone_pdf(cos_theta_max), cos_theta.shape)


def uniform_sphere_sample(u2):
    """Uniform sphere via octahedral concentric map (RT Gems 16.5.4.2)."""
    u = 2.0 * u2 - 1.0
    d = 1.0 - (jnp.abs(u[..., 0]) + jnp.abs(u[..., 1]))
    r = 1.0 - jnp.abs(d)
    safe_r = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(
        r == 0.0, 0.0,
        (PI / 4) * ((jnp.abs(u[..., 0]) - jnp.abs(u[..., 1])) / safe_r + 1.0))
    f = r * jnp.sqrt(_gsafe(2.0 - r * r, 0.0))
    x = f * jnp.sign(u[..., 0]) * jnp.cos(phi)
    y = f * jnp.sign(u[..., 1]) * jnp.sin(phi)
    z = jnp.sign(d) * (1.0 - r * r)
    pdf = jnp.broadcast_to(0.25 * INV_PI, z.shape)
    return jnp.stack([x, y, z], axis=-1), pdf


def uniform_hemisphere_sample(u2):
    z = u2[..., 0]
    r = jnp.sqrt(_gsafe(1.0 - z * z, 0.0))
    phi = TWO_PI * u2[..., 1]
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, jnp.broadcast_to(0.5 * INV_PI, z.shape)


def cosine_hemisphere_pdf(abs_cos_theta):
    return abs_cos_theta * INV_PI


def cosine_hemisphere_sample(u2):
    r2 = u2[..., 0]
    r = jnp.sqrt(_gsafe(1.0 - r2, 0.0))
    z = jnp.sqrt(r2)
    phi = TWO_PI * u2[..., 1]
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, z * INV_PI


# ---------------------------------------------------------------------------
# GGX NDF sampling (Walter 2007)
# ---------------------------------------------------------------------------

def ggx_ndf(alpha, abs_cos_theta):
    """Isotropic GGX normal distribution D (Distributions.h GGX::D).

    Uses the division-free form a²/(π·(c²a² + s²)²) — algebraically equal to
    the reference's tan²-based expression but finite (value AND gradient) at
    the horizon c = 0, where the tan² form explodes under autodiff.
    """
    a2 = alpha * alpha
    c2 = abs_cos_theta * abs_cos_theta
    s2 = jnp.maximum(1.0 - c2, 0.0)
    # Floor the quadratic term: live lobes have q >= MIN_ALPHA² = 1e-8, so
    # 1e-9 never changes them, but a zeroed lobe (disabled coat, alpha = 0)
    # with h == ±z would otherwise give a denominator whose SQUARE (taken by
    # the division's backward rule) underflows float32 to 0 → 0/0 = NaN.
    q = jnp.maximum(c2 * a2 + s2, 1e-9)
    return a2 / (PI * q * q)


def ggx_ndf_pdf(alpha, abs_cos_theta):
    return ggx_ndf(alpha, abs_cos_theta) * abs_cos_theta


def ggx_ndf_sample(alpha, u2):
    """Sample a halfway vector from D(h)·cosθ (Walter 07)."""
    phi = TWO_PI * u2[..., 1]
    tan2 = alpha * alpha * u2[..., 0] / jnp.maximum(1.0 - u2[..., 0], 1e-10)
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan2)
    r = jnp.sqrt(_gsafe(1.0 - cos_theta * cos_theta, 0.0))
    h = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), cos_theta], axis=-1)
    return h, ggx_ndf_pdf(alpha, cos_theta)


# ---------------------------------------------------------------------------
# GGX VNDF sampling (Heitz 2018 / Dupuy 2023 spherical caps)
# ---------------------------------------------------------------------------

def _ggx_lambda(alpha, w):
    """Smith lambda for isotropic GGX (VNDF eq. 2)."""
    z2 = jnp.maximum(w[..., 2] * w[..., 2], 1e-12)
    return 0.5 * (-1.0 + jnp.sqrt(
        1.0 + (jnp.square(alpha * w[..., 0]) + jnp.square(alpha * w[..., 1])) / z2))


def ggx_vndf_sample_halfway(alpha, wo, u2):
    """Spherical-caps VNDF halfway sample (Dupuy & Benyoub 2023, listing 1)."""
    alpha = jnp.asarray(alpha, jnp.float32)[..., None]
    wo_std = normalize(
        jnp.concatenate([wo[..., :2] * alpha, wo[..., 2:3]], axis=-1))
    phi = TWO_PI * u2[..., 1]
    z = (1.0 - u2[..., 0]) * (1.0 + wo_std[..., 2]) - wo_std[..., 2]
    sin_theta = jnp.sqrt(_gclip(1.0 - z * z, 0.0, 1.0))
    c = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), z], axis=-1)
    wi_std = c + wo_std
    h = jnp.concatenate(
        [wi_std[..., :2] * alpha, jnp.maximum(wi_std[..., 2:3], 0.0)], axis=-1)
    return normalize(h)


def ggx_vndf_pdf(alpha, wo, halfway):
    """PDF of the VNDF halfway sample (Heitz 2018, eq. 3)."""
    recip_g1 = 1.0 + _ggx_lambda(alpha, wo)
    d = ggx_ndf(alpha, jnp.abs(halfway[..., 2]))
    cos_oh = jnp.maximum(jnp.sum(wo * halfway, axis=-1), 0.0)
    return cos_oh * d / (recip_g1 * jnp.maximum(jnp.abs(wo[..., 2]), 1e-10))


def ggx_vndf_sample(alpha, wo, u2):
    h = ggx_vndf_sample_halfway(alpha, wo, u2)
    return h, ggx_vndf_pdf(alpha, wo, h)


# ---------------------------------------------------------------------------
# Bounded GGX VNDF reflection sampling (Eto et al. 2023)
# ---------------------------------------------------------------------------

def _bounded_k(alpha, wo):
    """Eto 2023 eq. 5-6 shrinking factor for the spherical cap."""
    a2 = alpha * alpha
    s = 1.0 + jnp.sqrt(
        _gsafe(wo[..., 0] ** 2 + wo[..., 1] ** 2, 0.0))
    s2 = s * s
    return (1.0 - a2) * s2 / (s2 + a2 * wo[..., 2] * wo[..., 2])


def ggx_bounded_vndf_sample(alpha, wo, u2):
    """Sample a *reflection* direction from the bounded VNDF.

    Returns (wi [..., 3], pdf). Unlike plain VNDF this directly importance
    samples reflections that stay in the upper hemisphere, the reference's
    default GGX reflection sampler (BSDFs/GGX.h:112-134).
    """
    alpha_c = jnp.asarray(alpha, jnp.float32)[..., None]
    wo_std = normalize(
        jnp.concatenate([wo[..., :2] * alpha_c, wo[..., 2:3]], axis=-1))
    phi = TWO_PI * u2[..., 1]
    k = _bounded_k(jnp.asarray(alpha, jnp.float32), wo)
    b = jnp.where(wo[..., 2] >= 0.0, k * wo_std[..., 2], wo_std[..., 2])
    z = (1.0 - u2[..., 0]) * (1.0 + b) - b
    sin_theta = jnp.sqrt(_gclip(1.0 - z * z, 0.0, 1.0))
    o_std = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), z], axis=-1)
    h_std = wo_std + o_std
    h = normalize(
        jnp.concatenate([h_std[..., :2] * alpha_c, h_std[..., 2:3]], axis=-1))
    wi = reflect(-wo, h)
    return wi, ggx_bounded_vndf_pdf(alpha, wo, wi)


def ggx_bounded_vndf_pdf(alpha, wo, wi):
    """PDF of the bounded-VNDF reflection sample (Eto 2023, listing 2)."""
    alpha = jnp.asarray(alpha, jnp.float32)
    h = normalize(wo + wi)
    ndf = ggx_ndf(alpha, jnp.abs(h[..., 2]))
    ao2 = jnp.square(alpha * wo[..., 0]) + jnp.square(alpha * wo[..., 1])
    t = jnp.sqrt(_gsafe(ao2 + wo[..., 2] * wo[..., 2], 0.0))
    k = _bounded_k(alpha, wo)
    upper = ndf / (2.0 * (k * wo[..., 2] + t))                 # Eq. 8
    # Eq. 7 for wo.z < 0. Double-where: the lower branch's denominator is
    # forced to 1 on unselected lanes — the quotient rule would otherwise
    # square the 1e-20 clamp into inf and NaN-poison backward passes.
    neg = wo[..., 2] < 0.0
    safe_ao2 = jnp.where(neg, jnp.maximum(2.0 * ao2, 1e-10), 1.0)
    lower = ndf * (t - wo[..., 2]) / safe_ao2
    return jnp.where(neg, lower, upper)


# ---------------------------------------------------------------------------
# Oren-Nayar CLTC sampling (EON paper, arXiv 2410.18026, listing 3)
# ---------------------------------------------------------------------------

def _cltc_coeffs(cos_theta, roughness):
    """LTC matrix coefficients fit for Oren-Nayar (Distributions.h:206-212)."""
    mu, r = cos_theta, roughness
    a = 1.0 + r * (0.303392 + (-0.518982 + 0.111709 * mu) * mu
                   + (-0.276266 + 0.335918 * mu) * r)
    b = r * (-1.16407 + 1.15859 * mu + (0.150815 - 0.150105 * mu) * r) / (
        mu * mu * mu - 1.43545)
    c = 1.0 + (0.20013 + (-0.506373 + 0.261777 * mu) * mu) * r
    d = ((0.540852 + (-1.01625 + 0.475392 * mu) * mu) * r) / (
        -1.0743 + mu * (0.0725628 + mu))
    return a, b, c, d


def _ltc_tangents(wo):
    """2D rotation aligning wo's azimuth with +x (Distributions.h:196-204)."""
    wh = wo[..., :2]
    len2 = jnp.sum(wh * wh, axis=-1, keepdims=True)
    x = jnp.where(len2 > 0.0, wh / jnp.sqrt(_gsafe(len2, 1e-20)),
                  jnp.asarray([1.0, 0.0], jnp.float32))
    return x  # X axis; Y = (-X.y, X.x)


def oren_nayar_cltc_sample(roughness, wo, u2):
    """CLTC direction sample for EON Oren-Nayar. Returns (wi, pdf)."""
    a, b, c, d = _cltc_coeffs(wo[..., 2], roughness)
    radius = jnp.sqrt(u2[..., 0])
    phi = TWO_PI * u2[..., 1]
    x = radius * jnp.cos(phi)
    y = radius * jnp.sin(phi)
    vz = 1.0 / jnp.sqrt(d * d + 1.0)
    s = 0.5 * (1.0 + vz)
    x = -lerp(jnp.sqrt(_gsafe(1.0 - y * y, 0.0)), x, s)
    whz = jnp.sqrt(_gsafe(1.0 - (x * x + y * y), 0.0))
    pdf_wh = whz / (PI * s)
    wi = jnp.stack([a * x + b * whz, c * y, d * x + whz], axis=-1)
    wi_mag2 = jnp.sum(wi * wi, axis=-1)
    det_m = c * (a - b * d)
    pdf_wi = pdf_wh * wi_mag2 * jnp.sqrt(wi_mag2) / jnp.maximum(det_m, 1e-10)
    # Rotate from LTC frame (wo azimuth on +x) back to tangent space.
    xaxis = _ltc_tangents(wo)
    cx, sx = xaxis[..., 0], xaxis[..., 1]
    wx = cx * wi[..., 0] - sx * wi[..., 1]
    wy = sx * wi[..., 0] + cx * wi[..., 1]
    wi = normalize(jnp.stack([wx, wy, wi[..., 2]], axis=-1))
    return wi, pdf_wi


def oren_nayar_cltc_pdf(roughness, wo, wi):
    """PDF of the CLTC sample (Distributions.h:246-259)."""
    xaxis = _ltc_tangents(wo)
    cx, sx = xaxis[..., 0], xaxis[..., 1]
    # Transpose rotation: LTC-space wi.
    lx = cx * wi[..., 0] + sx * wi[..., 1]
    ly = -sx * wi[..., 0] + cx * wi[..., 1]
    lz = wi[..., 2]
    a, b, c, d = _cltc_coeffs(wo[..., 2], roughness)
    det_m = c * (a - b * d)
    whx = c * (lx - b * lz)
    why = (a - b * d) * ly
    whz = -c * (d * lx - a * lz)
    wh_mag2 = whx * whx + why * why + whz * whz
    vz = 1.0 / jnp.sqrt(d * d + 1.0)
    s = 0.5 * (1.0 + vz)
    return (det_m * det_m / jnp.maximum(jnp.square(wh_mag2), 1e-10)
            * jnp.maximum(whz, 0.0) / (PI * s))


# ---------------------------------------------------------------------------
# Participating media (Math/Distributions.h:19-176, used by smallvpt)
# ---------------------------------------------------------------------------

def henyey_greenstein_phase(g, cos_theta):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * PI * denom * jnp.sqrt(_gsafe(denom, 1e-20)))


def henyey_greenstein_sample(g, u2):
    """Sample the HG phase function about +z. Returns (direction, pdf)."""
    g = jnp.asarray(g, jnp.float32)
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1.0, g)
    sqr_term = (1.0 - g * g) / (1.0 + g * (2.0 * u2[..., 0] - 1.0))
    cos_theta_aniso = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * safe_g)
    cos_theta_iso = 1.0 - 2.0 * u2[..., 0]
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, cos_theta_iso, cos_theta_aniso)
    sin_theta = jnp.sqrt(_gsafe(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * u2[..., 1]
    d = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)
    return d, henyey_greenstein_phase(g, cos_theta)


def exponential_distance_sample(sigma_t, u):
    """Free-flight distance ~ sigma_t * exp(-sigma_t x). Returns (t, pdf)."""
    t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sigma_t
    return t, sigma_t * jnp.exp(-sigma_t * t)
