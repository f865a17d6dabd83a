"""Shading-model tests — counterparts of
tests/OptiXRendererTests/ShadingModels/* (SURVEY.md §4): white furnace,
metallic interpolation linearity, sampling-probability ∝ reflectance,
Fresnel behavior, and rho-table validation against live integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.bsdf import ggx
from bifrost3d_tpu.shading import (
    DefaultShading,
    DiffuseShading,
    TransmissiveShading,
    get_fittings,
    sample_ggx_rho,
)
from bsdf_test_utils import pmj_u2, wo_from_cos_theta


def _u3(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random((n, 3)), jnp.float32)


def make_default(n, tint=(1, 1, 1), roughness=0.5, specularity=0.04,
                 metallic=0.0, coat=0.0, coat_roughness=0.0, cos_theta=0.707):
    return DefaultShading.create(
        tint=jnp.broadcast_to(jnp.asarray(tint, jnp.float32), (n, 3)),
        roughness=jnp.full((n,), roughness, jnp.float32),
        specularity=jnp.full((n,), specularity, jnp.float32),
        metallic=jnp.full((n,), metallic, jnp.float32),
        coat=jnp.full((n,), coat, jnp.float32),
        coat_roughness=jnp.full((n,), coat_roughness, jnp.float32),
        abs_cos_theta_o=jnp.full((n,), cos_theta, jnp.float32))


def estimate_rho(shading, cos_theta, n=8192, seed=0):
    wo = wo_from_cos_theta(cos_theta, n)
    u3 = jnp.concatenate([pmj_u2(n),
                          _u3(n, seed)[:, 2:3]], axis=-1)
    s = shading.sample(wo, u3)
    pdf = np.maximum(np.asarray(s.pdf), 1e-12)
    valid = np.asarray(s.pdf) > 1e-9
    cos = np.abs(np.asarray(s.direction[..., 2]))
    delta = np.asarray(s.is_delta)
    w = np.where(delta, 1.0, cos / pdf)
    contrib = np.where(valid[:, None], np.asarray(s.reflectance)
                       * np.where(delta, cos / pdf, cos / pdf)[:, None], 0.0)
    return contrib.mean(axis=0)


class TestFittings:
    def test_ggx_rho_table_matches_live_integration(self):
        """GGXTest.h validate_ggx_reflection_rho_precomputations analogue."""
        for cos_theta, roughness in [(0.3, 0.25), (0.7, 0.5), (0.9, 0.9)]:
            table = float(sample_ggx_rho(jnp.float32(cos_theta), jnp.float32(roughness)))
            # Live MC integration of GGX with specularity 1.
            n = 16384
            wo = wo_from_cos_theta(cos_theta, n)
            s = ggx.r_sample(ggx.alpha_from_roughness(roughness), 1.0, wo, pmj_u2(n))
            pdf = np.maximum(np.asarray(s.pdf), 1e-12)
            live = np.mean(np.where(np.asarray(s.pdf) > 1e-9,
                                    np.asarray(s.reflectance[:, 0])
                                    * np.asarray(s.direction[:, 2]) / pdf, 0.0))
            np.testing.assert_allclose(table, live, rtol=0.03)

    def test_tables_monotonic_sanity(self):
        f = get_fittings()
        g = np.asarray(f.ggx)
        assert g.shape == (32, 32)
        assert np.all(g > 0.2) and np.all(g <= 1.02)
        # Full-specularity rho decreases with roughness at normal incidence
        # (energy lost to multi-scatter).
        assert g[0, -1] > g[-1, -1]


class TestDefaultShading:
    @pytest.mark.parametrize("roughness", [0.25, 0.75])
    def test_white_hot_room(self, roughness):
        """Fully white material in a white furnace: rho == 1 within tol
        (DefaultShadingTest.h:60-78)."""
        for ct in (0.3, 0.7, 1.0):
            shading = make_default(
                8192, tint=(1, 1, 1), roughness=roughness, metallic=1.0,
                cos_theta=ct)
            rho = estimate_rho(shading, ct)
            np.testing.assert_allclose(rho, 1.0, atol=0.025)

    def test_metallic_interpolation_linearity(self):
        """evaluate(metallic=m) == lerp(evaluate(0), evaluate(1), m)
        (DefaultShadingTest metallic tests)."""
        n = 1024
        wo = wo_from_cos_theta(0.6, n)
        wi_s = make_default(n).sample(wo, _u3(n, 3))
        wi = wi_s.direction
        f = {}
        for m in (0.0, 0.5, 1.0):
            sh = make_default(n, tint=(0.8, 0.5, 0.3), roughness=0.4, metallic=m,
                              cos_theta=0.6)
            f[m] = np.asarray(sh.evaluate_with_pdf(wo, wi).reflectance)
        np.testing.assert_allclose(
            f[0.5], 0.5 * (f[0.0] + f[1.0]), rtol=0.02, atol=1e-4)

    def test_sampling_probabilities_proportional_to_rho(self):
        n = 4
        # Highly specular metal → specular probability near 1.
        metal = make_default(n, tint=(1, 0.8, 0.6), roughness=0.2, metallic=1.0)
        assert float(metal.specular_probability[0]) > 0.95
        # Matte dielectric → diffuse dominates.
        matte = make_default(n, tint=(0.8, 0.8, 0.8), roughness=0.9,
                             specularity=0.02)
        assert float(matte.diffuse_probability[0]) > 0.7

    def test_grazing_fresnel_white_on_dielectric(self):
        """At grazing angles a dielectric's specular rho → 1 regardless of
        tint (DefaultShadingTest.h:144-180)."""
        sh_grazing = make_default(4, tint=(0.1, 0.6, 0.2), roughness=0.1,
                                  specularity=0.04, cos_theta=0.02)
        sh_normal = make_default(4, tint=(0.1, 0.6, 0.2), roughness=0.1,
                                 specularity=0.04, cos_theta=1.0)
        rho_g = np.asarray(sh_grazing.specular_rho(jnp.full((4,), 0.02)))
        rho_n = np.asarray(sh_normal.specular_rho(jnp.full((4,), 1.0)))
        assert rho_g[0, 0] > 5 * rho_n[0, 0]
        # Grazing specular is white-ish (channels near-equal).
        assert abs(rho_g[0, 0] - rho_g[0, 2]) < 0.05

    def test_function_consistency(self):
        n = 2048
        sh = make_default(n, tint=(0.5, 0.5, 0.5), roughness=0.5,
                          specularity=0.04, cos_theta=0.6)
        wo = wo_from_cos_theta(0.6, n)
        s = sh.sample(wo, _u3(n, 4))
        resp = sh.evaluate_with_pdf(wo, s.direction)
        valid = (np.asarray(s.pdf) > 1e-6) & ~np.asarray(s.is_delta)
        np.testing.assert_allclose(
            np.asarray(s.pdf)[valid], np.asarray(resp.pdf)[valid], rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s.reflectance)[valid], np.asarray(resp.reflectance)[valid],
            rtol=1e-4, atol=1e-6)

    def test_coat_adds_reflection(self):
        n = 4096
        plain = make_default(n, tint=(0.2, 0.2, 0.2), roughness=0.8)
        coated = make_default(n, tint=(0.2, 0.2, 0.2), roughness=0.8,
                              coat=1.0, coat_roughness=0.05)
        rho_plain = estimate_rho(plain, 0.707, n=4096)
        rho_coat = estimate_rho(coated, 0.707, n=4096)
        # Coat reflects extra light at the top interface.
        assert rho_coat.mean() > rho_plain.mean()
        assert float(coated.coat_probability[0]) > 0.0

    def test_path_regularization_clamps_roughness(self):
        n = 4
        smooth = DefaultShading.create_with_max_pdf_hint(
            tint=jnp.ones((n, 3)), roughness=jnp.zeros(n),
            specularity=jnp.full((n,), 0.04), metallic=jnp.zeros(n),
            coat=jnp.zeros(n), coat_roughness=jnp.zeros(n),
            abs_cos_theta_o=jnp.full((n,), 0.8),
            max_pdf=jnp.full((n,), 10.0))
        assert float(smooth.roughness[0]) > 0.05  # clamped up from 0


class TestDiffuseShading:
    def test_rho_is_tint(self):
        sh = DiffuseShading.create(
            tint=jnp.broadcast_to(jnp.asarray([0.6, 0.4, 0.2]), (8192, 3)),
            roughness=jnp.full((8192,), 0.5))
        rho = estimate_rho(sh, 0.707)
        np.testing.assert_allclose(rho, [0.6, 0.4, 0.2], atol=0.02)


class TestTransmissiveShading:
    def test_white_glass_furnace(self):
        """Clear glass transmits + reflects all energy after the
        energy-loss compensation."""
        n = 8192
        sh = TransmissiveShading.create(
            tint=jnp.ones((n, 3)),
            roughness=jnp.full((n,), 0.4),
            specularity=jnp.full((n,), 0.04),
            cos_theta_o=jnp.full((n,), 0.707))
        wo = wo_from_cos_theta(0.707, n)
        u3 = jnp.concatenate([pmj_u2(n), _u3(n, 5)[:, 2:3]], axis=-1)
        s = sh.sample(wo, u3)
        pdf = np.maximum(np.asarray(s.pdf), 1e-12)
        valid = np.asarray(s.pdf) > 1e-9
        cos = np.abs(np.asarray(s.direction[..., 2]))
        contrib = np.where(valid, np.asarray(s.reflectance[:, 0]) * cos / pdf, 0.0)
        np.testing.assert_allclose(contrib.mean(), 1.0, atol=0.03)

    def test_rho_blends_tint(self):
        n = 4
        sh = TransmissiveShading.create(
            tint=jnp.broadcast_to(jnp.asarray([1.0, 0.2, 0.2]), (n, 3)),
            roughness=jnp.full((n,), 0.3),
            specularity=jnp.full((n,), 0.04),
            cos_theta_o=jnp.full((n,), 0.9))
        rho = np.asarray(sh.rho(jnp.full((n,), 0.9)))
        # Red transmits fully; green/blue only the reflected part.
        assert rho[0, 0] > 0.9
        assert rho[0, 1] < 0.5
