"""Statistical BSDF property-test harness.

Counterpart of the reference's ``tests/OptiXRendererTests/BSDFTestUtils.h``
(SURVEY.md §4): directional-hemispherical reflectance (rho) estimation with
PMJ-BN samples, power conservation, Helmholtz reciprocity, sample/evaluate
consistency, and PDF positivity — applied to the wavefront-vectorized JAX
BSDFs instead of per-sample C++ calls.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.sampling import pmj02_bn_samples

_PMJ_CACHE = {}


def pmj_u2(count: int) -> jnp.ndarray:
    if count not in _PMJ_CACHE:
        _PMJ_CACHE[count] = jnp.asarray(pmj02_bn_samples(count))
    return _PMJ_CACHE[count]


def wo_from_cos_theta(cos_theta: float, n: int = 1) -> jnp.ndarray:
    sin_theta = float(np.sqrt(max(0.0, 1.0 - cos_theta * cos_theta)))
    return jnp.broadcast_to(
        jnp.asarray([sin_theta, 0.0, cos_theta], jnp.float32), (n, 3))


def directional_hemispherical_reflectance(sample_fn, wo_single, sample_count=16384):
    """MC rho estimate: mean of f*|cos(wi)|/pdf over sample() draws.

    ``sample_fn(wo, u2) -> BSDFSample``; returns (mean rho [3], std of the
    scalar estimator) like the reference's streaming-statistics harness.
    """
    u2 = pmj_u2(sample_count)
    wo = jnp.broadcast_to(wo_single, (sample_count, 3))
    s = sample_fn(wo, u2)
    valid = np.asarray(s.pdf) > 1e-9
    f = np.asarray(s.reflectance)
    cos = np.abs(np.asarray(s.direction[..., 2]))
    pdf = np.maximum(np.asarray(s.pdf), 1e-12)
    is_delta = np.asarray(s.is_delta)
    # Delta lobes: reflectance already folds 1/|cos|; weight = f*cos/pdf still.
    contrib = np.where(valid[:, None], f * np.where(
        is_delta, 1.0, cos / pdf * 1.0)[:, None], 0.0)
    # For delta: f includes 1/cos factor, so f*cos = actual reflectance; pdf
    # is the discrete lobe probability.
    contrib = np.where(
        (valid & is_delta)[:, None], (f * cos[:, None]) / pdf[:, None], contrib)
    rho = contrib.mean(axis=0)
    std = contrib.mean(axis=1).std()
    return rho, std


def check_power_conservation(sample_fn, cos_thetas=(0.1, 0.4, 0.7, 1.0),
                             sample_count=16384, tolerance=1e-2):
    for ct in cos_thetas:
        rho, _ = directional_hemispherical_reflectance(
            sample_fn, wo_from_cos_theta(ct)[0], sample_count)
        assert np.all(rho <= 1.0 + tolerance), (
            f"rho {rho} exceeds 1 at cos_theta {ct}")


def check_helmholtz_reciprocity(evaluate_fn, wo_single, sample_count=1024,
                                tolerance=1e-4):
    """f(wo, wi) == f(wi, wo) over random upper-hemisphere wi."""
    rng = np.random.default_rng(0)
    z = rng.random(sample_count)
    phi = 2 * np.pi * rng.random(sample_count)
    r = np.sqrt(np.maximum(1 - z * z, 0))
    wi = jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], -1), jnp.float32)
    wo = jnp.broadcast_to(wo_single, (sample_count, 3))
    a = np.asarray(evaluate_fn(wo, wi))
    b = np.asarray(evaluate_fn(wi, wo))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=tolerance)


def check_function_consistency(sample_fn, evaluate_with_pdf_fn, wo_single,
                               sample_count=1024, rtol=1e-3, atol=1e-4):
    """sample().{f,pdf} must match evaluate_with_pdf() at the sampled wi
    (non-delta samples only)."""
    u2 = pmj_u2(sample_count)
    wo = jnp.broadcast_to(wo_single, (sample_count, 3))
    s = sample_fn(wo, u2)
    resp = evaluate_with_pdf_fn(wo, s.direction)
    valid = (np.asarray(s.pdf) > 1e-6) & ~np.asarray(s.is_delta)
    np.testing.assert_allclose(
        np.asarray(s.pdf)[valid], np.asarray(resp.pdf)[valid], rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        np.asarray(s.reflectance)[valid], np.asarray(resp.reflectance)[valid],
        rtol=rtol, atol=atol)


def check_pdf_positivity(sample_fn, wo_single, sample_count=1024):
    """f > 0 implies pdf > 0 on sampled directions."""
    u2 = pmj_u2(sample_count)
    wo = jnp.broadcast_to(wo_single, (sample_count, 3))
    s = sample_fn(wo, u2)
    f_pos = np.any(np.asarray(s.reflectance) > 0, axis=-1)
    assert np.all(np.asarray(s.pdf)[f_pos] > 0)
