"""Burley normalized-diffusion BSSRDF (subsurface scattering profile).

Counterpart of ``Shading/BSDFs/BurleySSS.h`` (SURVEY.md §2.4): Christensen
& Burley 2015 approximate reflectance profiles with the exact analytic
profile inversion of Golubev 2019 (zero-radiance.github.io) and Karis'
fast approximation — all vectorized over the wavefront.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PI = np.float32(np.pi)


class Parameters(NamedTuple):
    """Precomputed profile parameters (BurleySSS::Parameters)."""

    diffuse_albedo: jnp.ndarray          # [..., 3]
    diffuse_mean_free_path: jnp.ndarray  # [..., 3] = l / s

    @staticmethod
    def search_light_scaling(diffuse_albedo):
        """Eq. 5, Approximate Reflectance Profiles (search-light config)."""
        a = diffuse_albedo - 0.8
        return 1.85 - diffuse_albedo + 7.0 * jnp.abs(a * a * a)

    @staticmethod
    def diffuse_light_scaling(diffuse_albedo):
        """Eq. 6 (diffuse-light config)."""
        return 1.9 - diffuse_albedo + 3.5 * jnp.square(diffuse_albedo - 0.8)

    @staticmethod
    def create(diffuse_albedo, mean_free_path, diffuse_light: bool = True):
        s = (Parameters.diffuse_light_scaling(diffuse_albedo) if diffuse_light
             else Parameters.search_light_scaling(diffuse_albedo))
        return Parameters(diffuse_albedo=diffuse_albedo,
                          diffuse_mean_free_path=mean_free_path / s)


def evaluate_profile(distance, diffuse_mean_free_path):
    """R(r): eq. 2 — sum of exp(-r/3d) and exp(-r/d) over 8π·d·r."""
    single = jnp.exp(-distance / (3.0 * diffuse_mean_free_path))
    multi = single * single * single
    normalizer = 8.0 * PI * diffuse_mean_free_path * jnp.maximum(distance, 1e-8)
    return (single + multi) / normalizer


def evaluate(params: Parameters, po, pi):
    """Eq. 3: albedo-weighted profile between entry and exit points."""
    r = jnp.linalg.norm(po - pi, axis=-1, keepdims=True)
    return params.diffuse_albedo * evaluate_profile(
        r, params.diffuse_mean_free_path)


def sample_diffusion_profile(u, diffuse_mean_free_path):
    """Exact analytic inversion of the polar CDF (Golubev 2019).

    Returns (radius, rcp_pdf) with the pdf in cartesian measure (includes
    the r Jacobian), matching BurleySSS.h:92-115.
    """
    log2_e = 1.44269504089
    u = jnp.clip(1.0 - u, 1e-7, 1.0)  # CDF → CCDF, nonzero
    g = 1.0 + (4.0 * u) * (2.0 * u + jnp.sqrt(1.0 + (4.0 * u) * u))
    n = jnp.exp2(jnp.log2(g) * (-1.0 / 3.0))
    p = (g * n) * n
    c = 1.0 + p + n
    x = (3.0 / log2_e) * jnp.log2(c / (4.0 * u))
    cc = c * c
    four_u = 4.0 * u
    rcp_exp = (cc * c) / (four_u * (cc + jnp.square(four_u)))
    radius = x * diffuse_mean_free_path
    rcp_pdf = (8.0 * PI * radius * diffuse_mean_free_path) * rcp_exp
    return radius, rcp_pdf


def sample_diffusion_profile_approximation(u, diffuse_mean_free_path, c=2.6):
    """Karis' closed-form approximation (Xie et al. 2020; UE5 uses c=2.6)."""
    u = jnp.clip(u, 0.0, 1.0 - 1e-7)
    return diffuse_mean_free_path * ((2.0 - c) * u - 2.0) * jnp.log(1.0 - u)
