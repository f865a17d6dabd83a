"""Linearly-transformed-cosine tests.

Mirrors ``tests/BifrostTests/Math/LTCTest.h`` (identity / inverse
consistency) plus fit-quality gates for the GGX reflection table
(``Assets/Shading/GGXLinearlyTransformedCosines.cpp`` analogue) — the
reference validates its fits by integration in the MaterialPrecomputations
app; here the gates live in the test suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.bsdf import ggx
from bifrost3d_tpu.math import ltc as L
from bifrost3d_tpu.shading.ltc_fit import (
    get_ggx_ltc_table,
    ggx_reflection_ltc_coefficients,
)


def _uniform_sphere(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u[:, 1]
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)


def test_identity_ltc_is_cosine_lobe():
    lt = L.IsotropicLTC.identity()
    w = jnp.asarray([[0, 0, 1.0], [0.6, 0, 0.8], [0.8, 0, -0.6]], jnp.float32)
    expected = np.maximum(np.asarray(w)[:, 2], 0.0) / np.pi
    np.testing.assert_allclose(np.asarray(L.pdf(lt, w)), expected, atol=1e-6)
    m = np.asarray(L.m_matrix(lt))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_inverse_m_is_inverse_of_m():
    rng = np.random.default_rng(3)
    for _ in range(5):
        p = rng.uniform(0.3, 1.5, 5)
        lt = L.IsotropicLTC(*[jnp.float32(v) for v in p])
        m = np.asarray(L.m_matrix(lt))
        inv_m = np.asarray(L.inverse_m_matrix(lt))
        np.testing.assert_allclose(m @ inv_m, np.eye(3), atol=1e-4)
        det = float(L.inverse_m_determinant(lt))
        np.testing.assert_allclose(det, np.linalg.det(inv_m), rtol=1e-4)


def test_pdf_integrates_to_one():
    # Well-conditioned LTC: quadrature over the sphere sums to 1.
    lt = L.IsotropicLTC(m00=jnp.float32(0.9), m11=jnp.float32(1.2),
                        m22=jnp.float32(1.1), m02=jnp.float32(0.6),
                        m20=jnp.float32(0.3))
    n = 512
    theta = (np.arange(n) + 0.5) / n * np.pi
    phi = (np.arange(2 * n) + 0.5) / (2 * n) * 2 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], -1)
    pdf = np.asarray(L.pdf(lt, jnp.asarray(dirs, jnp.float32)))
    integral = (pdf * np.sin(t)).sum() * (np.pi / n) * (np.pi / n)
    np.testing.assert_allclose(integral, 1.0, atol=2e-3)


def test_sample_pdf_consistency():
    rng = np.random.default_rng(4)
    lt = L.IsotropicLTC(m00=jnp.float32(0.7), m11=jnp.float32(1.3),
                        m22=jnp.float32(1.0), m02=jnp.float32(-0.4),
                        m20=jnp.float32(0.2))
    u = jnp.asarray(rng.uniform(size=(4096, 2)), jnp.float32)
    d, pdf = L.sample(lt, u)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(L.pdf(lt, d)),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0,
                               atol=1e-5)


def test_oren_nayar_coefficients_shape_and_normalization():
    # EON fit across a grid of (cos, roughness): pdf stays a density.
    cos_t = jnp.asarray([0.3, 0.7, 1.0], jnp.float32)
    rough = jnp.asarray([0.1, 0.5, 1.0], jnp.float32)
    lt = L.oren_nayar_ltc_coefficients(cos_t[:, None], rough[None, :])
    assert lt.m00.shape == (3, 3)
    dirs = jnp.asarray(_uniform_sphere(200_000, seed=5))
    lt_exp = L.IsotropicLTC(*(x[..., None] for x in lt))
    pdf = np.asarray(L.pdf(lt_exp, dirs[None, None]))
    integral = pdf.mean(axis=-1) * 4 * np.pi
    np.testing.assert_allclose(integral, 1.0, atol=0.05)


def test_ggx_ltc_table_shape_and_identity_limit():
    table = np.asarray(get_ggx_ltc_table())
    assert table.shape == (64, 64, 4)
    assert np.all(np.isfinite(table))
    # m00, m11 positive everywhere (log-space fit guarantees it).
    assert np.all(table[..., :2] > 0.0)


@pytest.mark.parametrize("cos_t,rough", [(0.9, 0.4), (0.5, 0.6), (0.7, 0.9)])
def test_ggx_ltc_fit_matches_normalized_ggx(cos_t, rough):
    """The fitted LTC approximates the normalized GGX D·G lobe: relative L1
    over GGX-importance-sampled directions under 12%."""
    alpha = float(ggx.alpha_from_roughness(rough))
    lt = ggx_reflection_ltc_coefficients(jnp.float32(cos_t), jnp.float32(rough))
    wo = jnp.asarray([np.sqrt(1 - cos_t ** 2), 0.0, cos_t], jnp.float32)
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.uniform(size=(8192, 2)), jnp.float32)
    s = ggx.r_sample(jnp.full((8192,), alpha), 1.0,
                     jnp.broadcast_to(wo, (8192, 3)), u)
    f = ggx.r_evaluate(alpha, 1.0, jnp.broadcast_to(wo, (8192, 3)),
                       s.direction)[..., 0]
    cos_wi = jnp.maximum(s.direction[..., 2], 0.0)
    weight = jnp.where(s.pdf > 1e-12, f * cos_wi / jnp.maximum(s.pdf, 1e-12), 0.0)
    rho = float(jnp.mean(weight))
    d_ggx = np.asarray(f * cos_wi) / rho
    d_ltc = np.asarray(L.pdf(lt, s.direction))
    ok = np.asarray(s.pdf) > 1e-9
    rel_l1 = np.abs(d_ltc[ok] - d_ggx[ok]).mean() / d_ggx[ok].mean()
    assert rel_l1 < 0.12, rel_l1


def test_ggx_ltc_integrates_to_one():
    lt = ggx_reflection_ltc_coefficients(jnp.float32(0.6), jnp.float32(0.5))
    dirs = jnp.asarray(_uniform_sphere(400_000, seed=7))
    pdf = np.asarray(L.pdf(lt, dirs))
    np.testing.assert_allclose(pdf.mean() * 4 * np.pi, 1.0, atol=0.03)


def test_lambert_fit_is_identity():
    lt = L.lambert_ltc_coefficients()
    assert float(lt.m00) == 1.0 and float(lt.m02) == 0.0
