"""Fresnel terms and specularity ↔ index-of-refraction conversions.

Counterpart of the reference's ``OptiXRenderer/Utils.h:29-204`` Fresnel
block (SURVEY.md §2.4). All elementwise jnp, grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

COAT_SPECULARITY = 0.04
COAT_IOR = 1.5
AIR_IOR = 1.0


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def schlick_fresnel(specularity, abs_cos_theta):
    """Schlick approximation; specularity broadcasts (scalar or RGB)."""
    t = _pow5(jnp.maximum(1.0 - abs_cos_theta, 0.0))
    return (1.0 - t) * specularity + t


def dielectric_schlick_fresnel(specularity, abs_cos_theta, ior_i_over_o):
    """Schlick with total-internal-reflection → 1 (Utils.h:190-204).

    ``abs_cos_theta`` must be non-negative and ``ior_i_over_o`` adjusted to
    the side being hit.
    """
    sin2 = 1.0 - abs_cos_theta * abs_cos_theta
    tir = sin2 >= jnp.square(ior_i_over_o)
    return jnp.where(tir, 1.0, schlick_fresnel(specularity, abs_cos_theta))


def dielectric_specularity(ior_o, ior_i):
    """Normal-incidence reflectance between two dielectrics."""
    return jnp.square((ior_o - ior_i) / (ior_o + ior_i))


def conductor_specularity(ior_o, ior_i, ext_i):
    ext2 = jnp.square(ext_i)
    return (jnp.square(ior_o - ior_i) + ext2) / (jnp.square(ior_o + ior_i) + ext2)


def dielectric_ior_from_specularity(specularity):
    """Inverse of dielectric_specularity with ior_o = 1 (Burley 2015 §3.2)."""
    return 2.0 / (1.0 - jnp.sqrt(specularity)) - 1.0


def conductor_ior_from_specularity(specularity, ext_i):
    a = specularity - 1.0
    b = 2.0 * specularity + 2.0
    c = a + (specularity - 1.0) * jnp.square(ext_i)
    d = b * b - 4.0 * a * c
    return (-b + jnp.sqrt(jnp.maximum(d, 0.0))) / (2.0 * a)


def adjust_dielectric_specularity_to_exterior_medium(exterior_ior, specularity_through_air):
    """Re-base an air-relative specularity to an arbitrary exterior medium.

    Used by the coat layer: the base specular lobe sits under a coat medium
    of IOR 1.5 (DefaultShading.h:78-103).
    """
    base_ior = dielectric_ior_from_specularity(specularity_through_air)
    return dielectric_specularity(exterior_ior, base_ior)


def adjust_conductor_specularity_to_exterior_medium(
        exterior_ior, specularity_through_air, extinction_coefficient):
    base_ior = conductor_ior_from_specularity(
        specularity_through_air, extinction_coefficient)
    return conductor_specularity(exterior_ior, base_ior, extinction_coefficient)
