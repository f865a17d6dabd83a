"""GGX microfacet BSDF: reflection, transmission, and combined R+T.

Counterpart of ``Shading/BSDFs/GGX.h`` (SURVEY.md §2.4): Walter 07 with
Schlick Fresnel, height-correlated Smith G, bounded-VNDF reflection sampling
(Eto 2023) and VNDF transmission sampling. The reference's early-outs and
hemisphere flips become masks/branch-free mirrors so one fused code path
serves the whole wavefront.

Conventions: alpha = roughness², ``MIN_ALPHA = 1e-4`` is "effectively
smooth" (delta mirror / delta refraction). ``ior_i_over_o`` = IOR of the
transmitted side over the incident side, pre-adjusted by the caller to the
hemisphere being hit (as in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from bifrost3d_tpu.bsdf.fresnel import dielectric_schlick_fresnel, schlick_fresnel
from bifrost3d_tpu.bsdf.types import BSDFResponse, BSDFSample
from bifrost3d_tpu.math.vec import normalize
from bifrost3d_tpu.sampling.distributions import (

    _ggx_lambda,
    ggx_bounded_vndf_pdf,
    ggx_bounded_vndf_sample,
    ggx_ndf,
    ggx_vndf_pdf,
    ggx_vndf_sample_halfway,
)


def _gsafe(x, floor):
    """max with a gradient-safe floor: sqrt'(0) = inf would poison masked
    lanes in backward passes, so never let the operand reach exactly 0."""
    return jnp.maximum(x, jnp.maximum(floor, 1e-12))


def _gclip(x, lo, hi):
    return jnp.clip(x, jnp.maximum(lo, 1e-12), hi)

MIN_ALPHA = 1e-4


def alpha_from_roughness(roughness):
    return jnp.maximum(MIN_ALPHA, roughness * roughness)


def roughness_from_alpha(alpha):
    return jnp.sqrt(alpha)


def effectively_smooth(alpha):
    # jnp result even for Python-float alpha: callers apply `~`/`|`, which
    # deprecates on builtin bools.
    return jnp.asarray(alpha) <= MIN_ALPHA


def height_correlated_g(alpha, wo, wi):
    """Height-correlated Smith masking-shadowing (PBRT v3 §8.4.3)."""
    return 1.0 / (1.0 + _ggx_lambda(alpha, wo) + _ggx_lambda(alpha, wi))


# ---------------------------------------------------------------------------
# Reflection lobe (GGX_R)
# ---------------------------------------------------------------------------

def r_evaluate(alpha, specularity, wo, wi):
    """Rough reflection f; 0 when effectively smooth or cross-hemisphere."""
    same_hemi = wo[..., 2] * wi[..., 2] > 0.0
    valid = jnp.logical_and(~effectively_smooth(alpha), same_hemi)
    halfway = normalize(wo + wi)
    g = height_correlated_g(alpha, wo, wi)
    d = ggx_ndf(alpha, jnp.abs(halfway[..., 2]))
    f = schlick_fresnel(
        jnp.asarray(specularity, jnp.float32),
        jnp.abs(jnp.sum(wo * halfway, axis=-1, keepdims=True)))  # [...,1] or [...,3]
    denom = 4.0 * wo[..., 2] * wi[..., 2]
    val = f * (d * g / jnp.where(jnp.abs(denom) > 1e-10, denom, 1.0))[..., None]
    val = jnp.broadcast_to(val, wo.shape)
    return jnp.where(valid[..., None], val, 0.0)


def r_pdf(alpha, wo, wi):
    """Bounded-VNDF reflection pdf; 0 when smooth (delta) or cross-hemisphere.

    Invalid (wo, wi) pairs are replaced by the mirror direction BEFORE the
    pdf math so the masked-out lanes never produce inf/NaN in backward
    passes (wi ≈ -wo gives a zero halfway vector otherwise).
    """
    same_hemi = wo[..., 2] * wi[..., 2] > 0.0
    mirror = jnp.concatenate([-wo[..., :2], wo[..., 2:3]], axis=-1)
    wi_safe = jnp.where(same_hemi[..., None], wi, mirror)
    p = ggx_bounded_vndf_pdf(alpha, wo, wi_safe)
    return jnp.where(effectively_smooth(alpha) | ~same_hemi, 0.0, p)


def r_evaluate_with_pdf(alpha, specularity, wo, wi) -> BSDFResponse:
    return BSDFResponse(r_evaluate(alpha, specularity, wo, wi), r_pdf(alpha, wo, wi))


def r_sample(alpha, specularity, wo, u2) -> BSDFSample:
    """Sample reflection: bounded VNDF for rough, delta mirror when smooth."""
    alpha = jnp.asarray(alpha, jnp.float32)
    smooth = effectively_smooth(alpha)
    # Rough path.
    wi_rough, pdf_rough = ggx_bounded_vndf_sample(alpha, wo, u2)
    f_rough = r_evaluate(alpha, specularity, wo, wi_rough)
    # Energy-loss discard: direction into the surface.
    bad = wi_rough[..., 2] < 0.0
    pdf_rough = jnp.where(bad, 0.0, pdf_rough)
    f_rough = jnp.where(bad[..., None], 0.0, f_rough)
    # Smooth path: delta mirror.
    wi_delta = jnp.concatenate([-wo[..., :2], wo[..., 2:3]], axis=-1)
    abs_z = jnp.maximum(jnp.abs(wo[..., 2:3]), 1e-7)  # [..., 1]
    f_delta = schlick_fresnel(
        jnp.asarray(specularity, jnp.float32), jnp.abs(wo[..., 2:3]))
    f_delta = jnp.broadcast_to(f_delta / abs_z, wi_delta.shape)

    smooth_b = jnp.broadcast_to(smooth, pdf_rough.shape)
    return BSDFSample(
        direction=jnp.where(smooth_b[..., None], wi_delta, wi_rough),
        pdf=jnp.where(smooth_b, 1.0, pdf_rough),
        is_delta=smooth_b,
        reflectance=jnp.where(smooth_b[..., None], f_delta, f_rough),
    )


# ---------------------------------------------------------------------------
# Transmission lobe (GGX_T)
# ---------------------------------------------------------------------------

def _transmission_pdf_scale(ior_i_over_o, wo, wi, halfway):
    """Change of variables d wh / d wi for refraction (PBRT v3)."""
    wo_h = jnp.sum(wo * halfway, axis=-1)
    wi_h = jnp.sum(wi * halfway, axis=-1)
    sqrt_denom = wo_h + ior_i_over_o * wi_h
    return (jnp.square(ior_i_over_o / jnp.where(jnp.abs(sqrt_denom) > 1e-10, sqrt_denom, 1.0))
            * jnp.abs(wi_h))


def _transmission_halfway(ior_i_over_o, wo, wi):
    ior = jnp.broadcast_to(
        jnp.asarray(ior_i_over_o, jnp.float32), wo.shape[:-1])[..., None]
    h = normalize(wo + ior * wi)
    return jnp.where(h[..., 2:3] < 0.0, -h, h)


def _refract_about(halfway, wo, ior_i_over_o):
    """Refract -wo through microfacet ``halfway``. Returns (wi, tir_mask)."""
    cos_i = jnp.sum(wo * halfway, axis=-1, keepdims=True)
    eta = 1.0 / jnp.broadcast_to(
        jnp.asarray(ior_i_over_o, jnp.float32), wo.shape[:-1])[..., None]
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(_gsafe(1.0 - sin2_t, 0.0))
    wi = eta * (-wo) + (eta * cos_i - cos_t) * halfway
    return wi, tir[..., 0]


def t_evaluate(alpha, ior_i_over_o, wo, wi, halfway=None):
    """Pure transmission (Fresnel removed, Walter 07 eq. 21)."""
    ior = jnp.asarray(ior_i_over_o, jnp.float32)
    if halfway is None:
        halfway = _transmission_halfway(jnp.broadcast_to(ior, wo.shape[:-1]), wo, wi)
    cross_hemi = jnp.sign(wo[..., 2]) != jnp.sign(wi[..., 2])
    wi_h = jnp.sum(wi * halfway, axis=-1)
    wo_h = jnp.sum(wo * halfway, axis=-1)
    # Discard backfacing microfacets (PBRT4 eq. 9.35): keep only samples
    # where wo and wi are each on the same side as the micro and macro normal.
    frontfacing = jnp.logical_and(wi_h * wi[..., 2] > 0, wo_h * wo[..., 2] > 0)
    valid = ~effectively_smooth(alpha) & cross_hemi & frontfacing
    g = height_correlated_g(alpha, wo, wi)
    d = ggx_ndf(alpha, jnp.abs(halfway[..., 2]))
    zz = wo[..., 2] * wi[..., 2]
    f1 = jnp.abs(wo_h * wi_h / jnp.where(jnp.abs(zz) > 1e-10, zz, 1.0))
    denom = wo_h + ior * wi_h
    f2 = jnp.square(ior) * g * d / jnp.square(
        jnp.where(jnp.abs(denom) > 1e-10, denom, 1.0))
    return jnp.where(valid, f1 * f2, 0.0)


def t_pdf(alpha, ior_i_over_o, wo, wi):
    ior = jnp.asarray(ior_i_over_o, jnp.float32)
    cross_hemi = jnp.sign(wo[..., 2]) != jnp.sign(wi[..., 2])
    # Mirror to the upper hemisphere (reference flips z when exiting).
    flip = wo[..., 2:3] < 0.0
    wo_u = jnp.where(flip, wo * jnp.asarray([1.0, 1.0, -1.0]), wo)
    wi_u = jnp.where(flip, wi * jnp.asarray([1.0, 1.0, -1.0]), wi)
    halfway = _transmission_halfway(jnp.broadcast_to(ior, wo.shape[:-1]), wo_u, wi_u)
    wo_h = jnp.sum(wo_u * halfway, axis=-1)
    wi_h = jnp.sum(wi_u * halfway, axis=-1)
    valid = (~effectively_smooth(alpha) & cross_hemi
             & (wo_h >= 0.0) & (wi_h < 0.0))
    p = ggx_vndf_pdf(alpha, wo_u, halfway) * _transmission_pdf_scale(
        ior, wo_u, wi_u, halfway)
    return jnp.where(valid, p, 0.0)


def t_evaluate_with_pdf(alpha, ior_i_over_o, wo, wi) -> BSDFResponse:
    f = t_evaluate(alpha, ior_i_over_o, wo, wi)
    return BSDFResponse(
        reflectance=jnp.repeat(f[..., None], 3, axis=-1),
        pdf=t_pdf(alpha, ior_i_over_o, wo, wi))


def t_sample(alpha, ior_i_over_o, wo, u2) -> BSDFSample:
    """Sample rough/delta transmission. Invalid (pdf=0) on TIR/energy loss."""
    alpha = jnp.asarray(alpha, jnp.float32)
    ior = jnp.asarray(ior_i_over_o, jnp.float32)
    entering = wo[..., 2:3] >= 0.0
    wo_u = jnp.where(entering, wo, wo * jnp.asarray([1.0, 1.0, -1.0]))

    # Rough path: VNDF halfway, refract.
    halfway = ggx_vndf_sample_halfway(alpha, wo_u, u2)
    pdf_h = ggx_vndf_pdf(alpha, wo_u, halfway)
    wi_rough, tir = _refract_about(halfway, wo_u, ior)
    energy_loss = wi_rough[..., 2] >= 0.0
    bad_rough = jnp.logical_or(tir, energy_loss)
    pdf_rough = pdf_h * _transmission_pdf_scale(ior, wo_u, wi_rough, halfway)
    f_rough = t_evaluate(alpha, ior, wo_u, wi_rough, halfway)
    pdf_rough = jnp.where(bad_rough, 0.0, pdf_rough)
    f_rough = jnp.where(bad_rough, 0.0, f_rough)

    # Smooth path: delta refraction through the macro normal.
    z_axis = jnp.zeros_like(wo_u).at[..., 2].set(1.0)
    wi_delta, tir_delta = _refract_about(z_axis, wo_u, ior)
    abs_z = jnp.maximum(jnp.abs(wi_delta[..., 2]), 1e-7)
    f_delta = jnp.where(tir_delta, 0.0, 1.0 / abs_z)
    pdf_delta = jnp.where(tir_delta, 0.0, 1.0)

    smooth = jnp.broadcast_to(effectively_smooth(alpha), pdf_rough.shape)
    wi = jnp.where(smooth[..., None], wi_delta, wi_rough)
    wi = jnp.where(entering, wi, wi * jnp.asarray([1.0, 1.0, -1.0]))
    f = jnp.where(smooth, f_delta, f_rough)
    return BSDFSample(
        direction=wi,
        pdf=jnp.where(smooth, pdf_delta, pdf_rough),
        is_delta=smooth,
        reflectance=jnp.repeat(f[..., None], 3, axis=-1),
    )


# ---------------------------------------------------------------------------
# Combined reflection + transmission (rough glass)
# ---------------------------------------------------------------------------

def _normalize_reflection_probability(reflection_probability, transmission_tint):
    """Skew lobe choice by the transmission tint's brightness (GGX.h:268-273)."""
    t_prob = 1.0 - reflection_probability
    scaled_t = jnp.sum(transmission_tint, axis=-1) * t_prob
    scaled_r = 3.0 * reflection_probability
    return scaled_r / jnp.maximum(scaled_r + scaled_t, 1e-10)


def evaluate(alpha, specularity, ior_i_over_o, wo, wi, transmission_tint=None):
    """Combined R+T f (scalar × tint for transmission)."""
    ior = jnp.asarray(ior_i_over_o, jnp.float32)
    flip = wo[..., 2:3] < 0.0
    mirror = jnp.asarray([1.0, 1.0, -1.0])
    wo_u = jnp.where(flip, wo * mirror, wo)
    wi_u = jnp.where(flip, wi * mirror, wi)
    is_reflection = wo_u[..., 2] * wi_u[..., 2] >= 0.0
    halfway_ior = jnp.where(is_reflection, 1.0, jnp.broadcast_to(ior, is_reflection.shape))
    halfway = _transmission_halfway(halfway_ior, wo_u, wi_u)
    g = height_correlated_g(alpha, wo_u, wi_u)
    d = ggx_ndf(alpha, jnp.abs(halfway[..., 2]))
    wo_h = jnp.sum(wo_u * halfway, axis=-1)
    wi_h = jnp.sum(wi_u * halfway, axis=-1)
    fres = dielectric_schlick_fresnel(specularity, jnp.abs(wo_h), ior)

    denom_r = 4.0 * wo_u[..., 2] * wi_u[..., 2]
    f_refl = fres * d * g / jnp.where(jnp.abs(denom_r) > 1e-10, denom_r, 1.0)

    frontfacing = jnp.logical_and(wi_h * wi_u[..., 2] > 0, wo_h * wo_u[..., 2] > 0)
    zz = wo_u[..., 2] * wi_u[..., 2]
    f1 = jnp.abs(wo_h * wi_h / jnp.where(jnp.abs(zz) > 1e-10, zz, 1.0))
    denom_t = wo_h + ior * wi_h
    f2 = (1.0 - fres) * g * d * jnp.square(
        ior / jnp.where(jnp.abs(denom_t) > 1e-10, denom_t, 1.0))
    f_trans = jnp.where(frontfacing, f1 * f2, 0.0)

    valid = ~effectively_smooth(alpha) & (jnp.abs(wo[..., 2]) > 0) & (jnp.abs(wi[..., 2]) > 0)
    f = jnp.where(valid, jnp.where(is_reflection, f_refl, f_trans), 0.0)
    if transmission_tint is None:
        return jnp.repeat(f[..., None], 3, axis=-1)
    tint = jnp.where(is_reflection[..., None], 1.0, transmission_tint)
    return f[..., None] * tint


def pdf(alpha, specularity, ior_i_over_o, wo, wi, transmission_tint=None):
    if transmission_tint is None:
        transmission_tint = jnp.ones(wo.shape[:-1] + (3,), jnp.float32)
    ior = jnp.asarray(ior_i_over_o, jnp.float32)
    flip = wo[..., 2:3] < 0.0
    mirror = jnp.asarray([1.0, 1.0, -1.0])
    wo_u = jnp.where(flip, wo * mirror, wo)
    wi_u = jnp.where(flip, wi * mirror, wi)
    is_reflection = wo_u[..., 2] * wi_u[..., 2] >= 0.0
    halfway_ior = jnp.where(is_reflection, 1.0, jnp.broadcast_to(ior, is_reflection.shape))
    halfway = _transmission_halfway(halfway_ior, wo_u, wi_u)
    wo_h = jnp.sum(wo_u * halfway, axis=-1)
    wi_h = jnp.sum(wi_u * halfway, axis=-1)
    backfacing = ~is_reflection & ((wo_h < 0.0) | (wi_h >= 0.0))

    p = ggx_vndf_pdf(alpha, wo_u, halfway)
    refl_prob = dielectric_schlick_fresnel(specularity, jnp.abs(wo_h), ior)
    norm_refl_prob = _normalize_reflection_probability(refl_prob, transmission_tint)
    p = p * jnp.where(is_reflection, norm_refl_prob, 1.0 - norm_refl_prob)
    scale_r = 1.0 / jnp.maximum(4.0 * wo_h, 1e-10)
    scale_t = _transmission_pdf_scale(ior, wo_u, wi_u, halfway)
    p = p * jnp.where(is_reflection, scale_r, scale_t)
    valid = ~effectively_smooth(alpha) & ~backfacing
    return jnp.where(valid, p, 0.0)


def evaluate_with_pdf(alpha, specularity, ior_i_over_o, wo, wi,
                      transmission_tint=None) -> BSDFResponse:
    return BSDFResponse(
        evaluate(alpha, specularity, ior_i_over_o, wo, wi, transmission_tint),
        pdf(alpha, specularity, ior_i_over_o, wo, wi, transmission_tint))


def sample(alpha, specularity, ior_i_over_o, wo, u3, transmission_tint=None) -> BSDFSample:
    """Sample combined R+T: u3 [..., 3] — (u, v) for the lobe, w for R-vs-T."""
    if transmission_tint is None:
        transmission_tint = jnp.ones(wo.shape[:-1] + (3,), jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    ior = jnp.asarray(ior_i_over_o, jnp.float32)
    entering = wo[..., 2:3] >= 0.0
    mirror = jnp.asarray([1.0, 1.0, -1.0])
    wo_u = jnp.where(entering, wo, wo * mirror)
    u2 = u3[..., :2]

    # --- rough path ---
    halfway = ggx_vndf_sample_halfway(alpha, wo_u, u2)
    pdf_h = ggx_vndf_pdf(alpha, wo_u, halfway)
    wo_h = jnp.sum(wo_u * halfway, axis=-1)
    refl_prob = dielectric_schlick_fresnel(specularity, jnp.abs(wo_h), ior)
    norm_refl_prob = _normalize_reflection_probability(refl_prob, transmission_tint)
    is_refl = u3[..., 2] < norm_refl_prob

    wi_refl = 2.0 * wo_h[..., None] * halfway - wo_u
    pdf_refl = pdf_h * norm_refl_prob / jnp.maximum(4.0 * wo_h, 1e-10)
    wi_trans, tir = _refract_about(halfway, wo_u, ior)
    pdf_trans = (pdf_h * (1.0 - norm_refl_prob)
                 * _transmission_pdf_scale(ior, wo_u, wi_trans, halfway))
    pdf_trans = jnp.where(tir, 0.0, pdf_trans)

    wi_rough = jnp.where(is_refl[..., None], wi_refl, wi_trans)
    pdf_rough = jnp.where(is_refl, pdf_refl, pdf_trans)
    energy_loss = jnp.where(
        is_refl, wi_rough[..., 2] < 0.0, wi_rough[..., 2] >= 0.0)
    pdf_rough = jnp.where(energy_loss, 0.0, pdf_rough)
    f_rough = evaluate(alpha, specularity, ior, wo_u, wi_rough, transmission_tint)
    f_rough = jnp.where(energy_loss[..., None], 0.0, f_rough)

    # --- smooth (delta) path ---
    refl_prob_d = dielectric_schlick_fresnel(specularity, jnp.abs(wo_u[..., 2]), ior)
    norm_refl_prob_d = _normalize_reflection_probability(refl_prob_d, transmission_tint)
    is_refl_d = u3[..., 2] < norm_refl_prob_d
    wi_mirror = jnp.concatenate([-wo_u[..., :2], wo_u[..., 2:3]], axis=-1)
    z_axis = jnp.zeros_like(wo_u).at[..., 2].set(1.0)
    wi_refr, tir_d = _refract_about(z_axis, wo_u, ior)
    wi_delta = jnp.where(is_refl_d[..., None], wi_mirror, wi_refr)
    pdf_delta = jnp.where(is_refl_d, norm_refl_prob_d, 1.0 - norm_refl_prob_d)
    pdf_delta = jnp.where(~is_refl_d & tir_d, 0.0, pdf_delta)
    abs_z = jnp.maximum(jnp.abs(wi_delta[..., 2]), 1e-7)
    f_delta_scalar = jnp.where(is_refl_d, refl_prob_d, 1.0 - refl_prob_d) / abs_z
    f_delta = f_delta_scalar[..., None] * jnp.where(
        is_refl_d[..., None], 1.0, transmission_tint)

    smooth = jnp.broadcast_to(effectively_smooth(alpha), pdf_rough.shape)
    wi = jnp.where(smooth[..., None], wi_delta, wi_rough)
    wi = jnp.where(entering, wi, wi * mirror)
    # Transmission tint applies to rough transmissions inside evaluate();
    # delta handled above.
    return BSDFSample(
        direction=wi,
        pdf=jnp.where(smooth, pdf_delta, pdf_rough),
        is_delta=smooth,
        reflectance=jnp.where(smooth[..., None], f_delta, f_rough),
    )
