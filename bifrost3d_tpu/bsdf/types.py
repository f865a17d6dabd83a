"""BSDF sample/response pytrees.

The reference encodes delta-dirac and invalid PDFs in the float's sign/NaN
bits (``OptiXRenderer/Types.h:152-204``). That trick breaks ``jax.grad`` (NaN
poisoning) and vectorized MIS, so here a PDF is a plain value plus an
explicit ``is_delta`` mask, and invalid samples are ``pdf <= 0``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BSDFResponse(NamedTuple):
    """Result of evaluate_with_pdf: reflectance f [..., 3], pdf [...]."""

    reflectance: jnp.ndarray
    pdf: jnp.ndarray


class BSDFSample(NamedTuple):
    """Result of sample(): direction wi [..., 3], pdf, delta mask, f [..., 3].

    For delta lobes ``reflectance`` already includes the 1/|cos| factor
    (matching the reference's convention in GGX_R::sample), and ``pdf`` holds
    the discrete lobe-selection probability.
    """

    direction: jnp.ndarray
    pdf: jnp.ndarray
    is_delta: jnp.ndarray
    reflectance: jnp.ndarray

    @staticmethod
    def none(shape=()) -> "BSDFSample":
        """An invalid sample (pdf == 0), the analogue of BSDFSample::none()."""
        return BSDFSample(
            direction=jnp.zeros(shape + (3,), jnp.float32),
            pdf=jnp.zeros(shape, jnp.float32),
            is_delta=jnp.zeros(shape, bool),
            reflectance=jnp.zeros(shape + (3,), jnp.float32),
        )


def invalidate(sample: BSDFSample, bad_mask) -> BSDFSample:
    """Zero out pdf/reflectance where ``bad_mask`` — branch-free discard."""
    return BSDFSample(
        direction=sample.direction,
        pdf=jnp.where(bad_mask, 0.0, sample.pdf),
        is_delta=jnp.logical_and(sample.is_delta, ~bad_mask),
        reflectance=jnp.where(bad_mask[..., None], 0.0, sample.reflectance),
    )
