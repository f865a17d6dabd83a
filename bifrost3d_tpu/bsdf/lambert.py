"""Lambert cosine BRDF — counterpart of ``Shading/BSDFs/Lambert.h``."""

from __future__ import annotations

import jax.numpy as jnp

from bifrost3d_tpu.bsdf.types import BSDFResponse, BSDFSample
from bifrost3d_tpu.sampling.distributions import (
    INV_PI,
    cosine_hemisphere_pdf,
    cosine_hemisphere_sample,
)


def evaluate(tint, wo=None, wi=None):
    return tint * INV_PI


def pdf(wo, wi):
    return cosine_hemisphere_pdf(jnp.maximum(wi[..., 2], 0.0))


def evaluate_with_pdf(tint, wo, wi) -> BSDFResponse:
    f = jnp.broadcast_to(tint * INV_PI, wi.shape)
    return BSDFResponse(reflectance=f, pdf=pdf(wo, wi))


def sample(tint, wo, u2) -> BSDFSample:
    wi, p = cosine_hemisphere_sample(u2)
    return BSDFSample(
        direction=wi,
        pdf=p,
        is_delta=jnp.zeros(p.shape, bool),
        reflectance=jnp.broadcast_to(tint * INV_PI, wi.shape),
    )
