"""Thin-sheet reflectance: light bouncing inside a thin-walled slab.

Counterpart of the reference's ``approx_thin_sheet_reflectance``
(``Shading/ShadingModels/Utils.h:132-166``) and its closed-form ground
truth ``smooth_thin_sheet_reflectance`` (``tests/OptiXRendererTests/
BSDFTestUtils.h:228-264``): the total reflected/transmitted throughput of
a thin dielectric sheet is the geometric series of internal bounces,

    Re = R0 + T0·Ti·Ri / (1 - Ri²)        Te = T0·Ti / (1 - Ri²)

where R0/T0 are the outside Fresnel terms and Ri/Ti the internal ones at
the refracted angle. The rough variant replaces the exact Fresnel factors
with the precomputed dielectric GGX rho table.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bifrost3d_tpu.bsdf.fresnel import (
    dielectric_schlick_fresnel,
    dielectric_specularity,
    schlick_fresnel,
)
from bifrost3d_tpu.scene.materials import AIR_IOR
from bifrost3d_tpu.shading.fittings import sample_dielectric_ggx_rho


class ThinSheetThroughput(NamedTuple):
    reflected: jnp.ndarray    # [..., 3]
    transmitted: jnp.ndarray  # [..., 3]


def refracted_cos_theta(abs_cos_theta, ior_i_over_o):
    """|cos| of the refracted direction for a ray entering at ``abs_cos``
    through a relative IOR, and whether refraction is possible (no TIR).
    Matches ``refract(float&, float, float)`` (Utils.h:258-271) called
    with a negative incident cosine."""
    inv = 1.0 / ior_i_over_o
    k = 1.0 - inv * inv * (1.0 - abs_cos_theta * abs_cos_theta)
    valid = k >= 0.0
    return jnp.sqrt(jnp.maximum(k, 0.0)), valid


def smooth_thin_sheet_reflectance(cos_theta_o, medium_ior,
                                  transmission_tint) -> ThinSheetThroughput:
    """Closed-form reflect/transmit throughput of a smooth thin sheet
    (BSDFTestUtils.h:228-264). ``transmission_tint`` is the full-sheet
    tint; each of the two surfaces contributes its square root."""
    cos_theta_o = jnp.asarray(cos_theta_o, jnp.float32)
    specularity = dielectric_specularity(AIR_IOR, medium_ior)
    tint_per_side = jnp.sqrt(jnp.asarray(transmission_tint, jnp.float32))

    refr_cos, valid = refracted_cos_theta(
        jnp.abs(cos_theta_o), medium_ior / AIR_IOR)

    r0 = dielectric_schlick_fresnel(specularity, jnp.abs(cos_theta_o),
                                    medium_ior / AIR_IOR)
    t0 = (1.0 - r0)[..., None] * tint_per_side
    ri = schlick_fresnel(specularity, refr_cos)
    ti = (1.0 - ri)[..., None] * tint_per_side

    series = 1.0 / (1.0 - ri * ri)
    reflected = r0[..., None] + (ri * series)[..., None] * t0 * ti
    transmitted = series[..., None] * t0 * ti

    ones = jnp.ones_like(reflected)
    return ThinSheetThroughput(
        reflected=jnp.where(valid[..., None], reflected, ones),
        transmitted=jnp.where(valid[..., None], transmitted, 0.0))


def approx_thin_sheet_reflectance(abs_cos_theta, roughness, ior_i_over_o,
                                  transmission_tint) -> ThinSheetThroughput:
    """Rough-sheet approximation (Utils.h:140-166): the smooth geometric
    series with Fresnel factors replaced by the dielectric GGX rho table
    (energy-loss compensated by dividing by total rho)."""
    abs_cos_theta = jnp.asarray(abs_cos_theta, jnp.float32)
    transmission_tint = jnp.asarray(transmission_tint, jnp.float32)

    refr_cos, valid = refracted_cos_theta(abs_cos_theta, ior_i_over_o)

    total0, reflected0 = sample_dielectric_ggx_rho(
        abs_cos_theta, roughness, ior_i_over_o)
    r0 = reflected0 / jnp.maximum(total0, 1e-6)
    t0 = 1.0 - r0
    # NOTE: the reference keeps the outside relative IOR for the internal
    # fetch too (Utils.h:153-155) — kept for behavioral parity.
    totali, reflectedi = sample_dielectric_ggx_rho(
        refr_cos, roughness, ior_i_over_o)
    ri = reflectedi / jnp.maximum(totali, 1e-6)
    ti = 1.0 - ri

    t0ti = (t0 * ti)[..., None] * transmission_tint
    transmitted = t0ti / (1.0 - ri * ri)[..., None]
    reflected = r0[..., None] + ri[..., None] * transmitted

    ones = jnp.ones(reflected.shape, jnp.float32)
    return ThinSheetThroughput(
        reflected=jnp.where(valid[..., None], reflected, ones),
        transmitted=jnp.where(valid[..., None], transmitted, 0.0))
