"""EON energy-preserving Oren-Nayar diffuse BRDF.

Counterpart of ``Shading/BSDFs/OrenNayar.h`` (SURVEY.md §2.4), implementing
"EON: A practical energy-preserving rough diffuse BRDF" (arXiv 2410.18026):
single-scatter FON term + color-neutral multi-scatter compensation, sampled
with a CLTC + uniform-hemisphere mixture. As in the reference, the BRDF is
evaluated with rho = 1 and tinted by albedo afterwards, so rho(albedo) is
exactly albedo.
"""

from __future__ import annotations

import jax.numpy as jnp

from bifrost3d_tpu.bsdf.types import BSDFResponse, BSDFSample
from bifrost3d_tpu.sampling.distributions import (
    INV_PI,
    oren_nayar_cltc_pdf,
    oren_nayar_cltc_sample,
    uniform_hemisphere_sample,
)

_C1_FON = 0.5 - 2.0 / (3.0 * jnp.pi)   # constant1_FON
_C2_FON = 2.0 / 3.0 - 28.0 / (15.0 * jnp.pi)


def _e_fon_approx(cos_theta, roughness, a, b):
    """Quartic fit of the directional albedo E_FON (OrenNayar.h:42-49)."""
    mucomp = 1.0 - cos_theta
    g = jnp.zeros_like(cos_theta)
    for coeff in (0.0714429953, -0.332181442, 0.491881867, 0.0571085289):
        g = mucomp * (coeff + g)
    return a + b * g


def evaluate_scalar(roughness, wo, wi):
    """Untinted EON BRDF value (rho = 1)."""
    cos_i, cos_o = wi[..., 2], wo[..., 2]
    s = jnp.sum(wi * wo, axis=-1) - cos_i * cos_o
    s_over_t = jnp.where(
        s > 0.0, s / jnp.maximum(jnp.maximum(cos_i, cos_o), 1e-7), s)
    a = 1.0 / (1.0 + _C1_FON * roughness)
    b = roughness * a
    f_single = INV_PI * a * (1.0 + roughness * s_over_t)
    ef_o = _e_fon_approx(cos_o, roughness, a, b)
    ef_i = _e_fon_approx(cos_i, roughness, a, b)
    avg_ef = a * (1.0 + _C2_FON * roughness)
    # multi_scatter_rho = avg_ef / (1 - (1 - avg_ef)) = 1 for rho=1 input —
    # kept in the reference for clarity; folded to 1 here.
    f_multi = (INV_PI * jnp.abs(1.0 - ef_o) * jnp.abs(1.0 - ef_i)
               / jnp.maximum(1e-7, 1.0 - avg_ef))
    return f_single + f_multi


def evaluate(albedo, roughness, wo, wi):
    return albedo * evaluate_scalar(roughness, wo, wi)[..., None]


def _uniform_probability(roughness, cos_theta):
    """Fitted mixture weight between uniform and CLTC lobes (OrenNayar.h:96)."""
    return jnp.power(jnp.maximum(roughness, 1e-7), 0.1) * (
        0.162925 + cos_theta * (-0.372058 + (0.538233 - 0.290822 * cos_theta) * cos_theta))


def pdf(roughness, wo, wi):
    u_prob = _uniform_probability(roughness, wo[..., 2])
    cltc = oren_nayar_cltc_pdf(roughness, wo, wi)
    uniform = 0.5 * INV_PI
    return u_prob * uniform + (1.0 - u_prob) * cltc


def evaluate_with_pdf(albedo, roughness, wo, wi) -> BSDFResponse:
    return BSDFResponse(evaluate(albedo, roughness, wo, wi), pdf(roughness, wo, wi))


def sample(albedo, roughness, wo, u2) -> BSDFSample:
    """Mixture-sample wi; branch-free: both lobes evaluated, masked select."""
    u_prob = _uniform_probability(roughness, wo[..., 2])
    pick_uniform = u2[..., 0] <= u_prob
    # Reuse the stratified coordinate within the picked lobe.
    ux_uniform = u2[..., 0] / jnp.maximum(u_prob, 1e-7)
    ux_cltc = (u2[..., 0] - u_prob) / jnp.maximum(1.0 - u_prob, 1e-7)
    ux = jnp.where(pick_uniform, ux_uniform, ux_cltc)
    u2r = jnp.stack([jnp.clip(ux, 0.0, 1.0 - 1e-7), u2[..., 1]], axis=-1)

    wi_uni, _ = uniform_hemisphere_sample(u2r)
    wi_cltc, _ = oren_nayar_cltc_sample(roughness, wo, u2r)
    wi = jnp.where(pick_uniform[..., None], wi_uni, wi_cltc)
    return BSDFSample(
        direction=wi,
        pdf=pdf(roughness, wo, wi),
        is_delta=jnp.zeros(wi.shape[:-1], bool),
        reflectance=evaluate(albedo, roughness, wo, wi),
    )
