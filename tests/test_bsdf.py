"""BSDF property tests — counterpart of tests/OptiXRendererTests/BSDFs/*
(SURVEY.md §4): power conservation, reciprocity, function consistency,
PDF positivity, Snell's law, white-furnace behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.bsdf import burley, fresnel, ggx, lambert, oren_nayar
from bsdf_test_utils import (
    check_function_consistency,
    check_helmholtz_reciprocity,
    check_pdf_positivity,
    check_power_conservation,
    directional_hemispherical_reflectance,
    pmj_u2,
    wo_from_cos_theta,
)

WHITE = jnp.ones(3, jnp.float32)


class TestFresnel:
    def test_specularity_ior_roundtrip(self):
        # specularity↔IOR round trips (reference MiscTest.h).
        for ior in (1.1, 1.33, 1.5, 2.4):
            s = fresnel.dielectric_specularity(1.0, ior)
            np.testing.assert_allclose(
                float(fresnel.dielectric_ior_from_specularity(s)), ior, rtol=1e-5)

    def test_schlick_limits(self):
        np.testing.assert_allclose(float(fresnel.schlick_fresnel(0.04, 1.0)), 0.04)
        np.testing.assert_allclose(float(fresnel.schlick_fresnel(0.04, 0.0)), 1.0)

    def test_dielectric_schlick_tir(self):
        # Leaving a dense medium at grazing angle → total internal reflection.
        f = fresnel.dielectric_schlick_fresnel(0.04, 0.2, 1.0 / 1.5)
        np.testing.assert_allclose(float(f), 1.0)

    def test_conductor_roundtrip(self):
        spec = jnp.asarray([0.95, 0.93, 0.88])
        ext = jnp.asarray([3.0, 2.5, 2.0])
        ior = fresnel.conductor_ior_from_specularity(spec, ext)
        back = fresnel.conductor_specularity(jnp.ones(3), ior, ext)
        np.testing.assert_allclose(np.asarray(back), np.asarray(spec), rtol=1e-4)


class TestLambert:
    def test_rho_equals_tint(self):
        rho, _ = directional_hemispherical_reflectance(
            lambda wo, u2: lambert.sample(WHITE * 0.75, wo, u2),
            wo_from_cos_theta(0.7)[0])
        np.testing.assert_allclose(rho, 0.75, atol=2e-3)

    def test_properties(self):
        sample_fn = lambda wo, u2: lambert.sample(WHITE, wo, u2)
        check_power_conservation(sample_fn)
        check_pdf_positivity(sample_fn, wo_from_cos_theta(0.5)[0])
        check_function_consistency(
            sample_fn,
            lambda wo, wi: lambert.evaluate_with_pdf(WHITE, wo, wi),
            wo_from_cos_theta(0.5)[0])
        check_helmholtz_reciprocity(
            lambda wo, wi: lambert.evaluate_with_pdf(WHITE, wo, wi).reflectance,
            wo_from_cos_theta(0.6)[0])


class TestBurley:
    @pytest.mark.parametrize("roughness", [0.0, 0.4, 1.0])
    def test_properties(self, roughness):
        sample_fn = lambda wo, u2: burley.sample(WHITE, roughness, wo, u2)
        # The reference checks Burley power conservation only at
        # wo = normalize(1,1,1) (BurleyTest.h:52-59) — the retro-reflection
        # term legitimately exceeds 1 at grazing angles.
        check_power_conservation(sample_fn, cos_thetas=(0.577,), tolerance=0.03)
        check_pdf_positivity(sample_fn, wo_from_cos_theta(0.5)[0])
        check_function_consistency(
            sample_fn,
            lambda wo, wi: burley.evaluate_with_pdf(WHITE, roughness, wo, wi),
            wo_from_cos_theta(0.5)[0])
        check_helmholtz_reciprocity(
            lambda wo, wi: burley.evaluate(WHITE, roughness, wo, wi),
            wo_from_cos_theta(0.6)[0])


class TestOrenNayar:
    @pytest.mark.parametrize("roughness", [0.0, 0.3, 0.7, 1.0])
    def test_white_furnace(self, roughness):
        """EON with albedo 1: rho == 1 within tolerance at all angles —
        the energy-preserving property the model exists for."""
        for ct in (0.15, 0.5, 0.9):
            rho, _ = directional_hemispherical_reflectance(
                lambda wo, u2: oren_nayar.sample(WHITE, roughness, wo, u2),
                wo_from_cos_theta(ct)[0])
            np.testing.assert_allclose(rho, 1.0, atol=0.015)

    @pytest.mark.parametrize("roughness", [0.3, 0.9])
    def test_properties(self, roughness):
        sample_fn = lambda wo, u2: oren_nayar.sample(WHITE, roughness, wo, u2)
        check_pdf_positivity(sample_fn, wo_from_cos_theta(0.5)[0])
        check_function_consistency(
            sample_fn,
            lambda wo, wi: oren_nayar.evaluate_with_pdf(WHITE, roughness, wo, wi),
            wo_from_cos_theta(0.5)[0], rtol=5e-3, atol=5e-4)
        check_helmholtz_reciprocity(
            lambda wo, wi: oren_nayar.evaluate(WHITE, roughness, wo, wi),
            wo_from_cos_theta(0.6)[0])


class TestGGXReflection:
    @pytest.mark.parametrize("roughness", [0.0, 0.2, 0.7, 1.0])
    def test_power_conservation(self, roughness):
        alpha = ggx.alpha_from_roughness(roughness)
        check_power_conservation(
            lambda wo, u2: ggx.r_sample(alpha, 1.0, wo, u2), tolerance=0.02)

    @pytest.mark.parametrize("roughness", [0.2, 0.7])
    def test_properties(self, roughness):
        alpha = ggx.alpha_from_roughness(roughness)
        sample_fn = lambda wo, u2: ggx.r_sample(alpha, 1.0, wo, u2)
        check_pdf_positivity(sample_fn, wo_from_cos_theta(0.5)[0])
        check_function_consistency(
            sample_fn,
            lambda wo, wi: ggx.r_evaluate_with_pdf(alpha, 1.0, wo, wi),
            wo_from_cos_theta(0.5)[0], rtol=5e-3, atol=1e-3)
        check_helmholtz_reciprocity(
            lambda wo, wi: ggx.r_evaluate(alpha, 1.0, wo, wi),
            wo_from_cos_theta(0.6)[0], tolerance=1e-3)

    def test_smooth_is_delta_mirror(self):
        wo = wo_from_cos_theta(0.8, 4)
        s = ggx.r_sample(jnp.float32(ggx.MIN_ALPHA / 2), 0.9, wo, pmj_u2(4))
        assert np.all(np.asarray(s.is_delta))
        d = np.asarray(s.direction)
        np.testing.assert_allclose(d[:, 2], 0.8, atol=1e-6)
        np.testing.assert_allclose(d[:, 0], -np.asarray(wo)[:, 0], atol=1e-6)

    def test_rho_increases_with_specularity(self):
        alpha = ggx.alpha_from_roughness(0.4)
        rhos = []
        for spec in (0.02, 0.5, 1.0):
            rho, _ = directional_hemispherical_reflectance(
                lambda wo, u2: ggx.r_sample(alpha, spec, wo, u2),
                wo_from_cos_theta(0.6)[0], sample_count=4096)
            rhos.append(rho[0])
        assert rhos[0] < rhos[1] < rhos[2]


class TestGGXTransmission:
    @pytest.mark.parametrize("roughness", [0.1, 0.5])
    @pytest.mark.parametrize("ior", [1.0 / 1.5, 1.5])
    def test_snells_law(self, roughness, ior):
        """Mean refraction direction obeys Snell (reference GGX_T snells_law)."""
        alpha = ggx.alpha_from_roughness(roughness)
        wo = wo_from_cos_theta(0.75, 4096)
        s = ggx.t_sample(alpha, ior, wo, pmj_u2(4096))
        valid = np.asarray(s.pdf) > 0
        d = np.asarray(s.direction)[valid]
        assert np.all(d[:, 2] < 0)  # transmitted into the lower hemisphere
        if roughness <= 0.1:
            # Near-smooth: direction concentrates on the analytic refraction.
            sin_in = np.sqrt(1 - 0.75**2)
            sin_out = np.linalg.norm(d[:, :2], axis=1).mean()
            np.testing.assert_allclose(sin_out, sin_in / ior, atol=0.03)

    def test_transmission_white_furnace(self):
        """Fresnel-free GGX_T transmits all energy (within sampling loss)."""
        alpha = ggx.alpha_from_roughness(0.3)
        rho, _ = directional_hemispherical_reflectance(
            lambda wo, u2: ggx.t_sample(alpha, 1.0 / 1.5, wo, u2),
            wo_from_cos_theta(0.9)[0])
        assert 0.92 < rho[0] <= 1.005

    def test_function_consistency(self):
        alpha = ggx.alpha_from_roughness(0.5)
        u2 = pmj_u2(1024)
        wo = wo_from_cos_theta(0.7, 1024)
        s = ggx.t_sample(alpha, 1.0 / 1.5, wo, u2)
        resp = ggx.t_evaluate_with_pdf(alpha, 1.0 / 1.5, wo, s.direction)
        valid = (np.asarray(s.pdf) > 1e-6) & ~np.asarray(s.is_delta)
        np.testing.assert_allclose(
            np.asarray(s.pdf)[valid], np.asarray(resp.pdf)[valid], rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(s.reflectance)[valid], np.asarray(resp.reflectance)[valid],
            rtol=5e-3, atol=1e-3)


class TestGGXCombined:
    @pytest.mark.parametrize("roughness", [0.1, 0.5])
    def test_energy_conservation(self, roughness):
        """R+T with specularity matching the IOR conserves energy overall."""
        ior = 1.5
        spec = float(fresnel.dielectric_specularity(1.0, ior))
        alpha = ggx.alpha_from_roughness(roughness)

        def sample_fn(wo, u2):
            u3 = jnp.concatenate(
                [u2, jnp.asarray(
                    np.random.default_rng(7).random((u2.shape[0], 1)), jnp.float32)],
                axis=-1)
            return ggx.sample(alpha, spec, ior, wo, u3)

        rho, _ = directional_hemispherical_reflectance(
            sample_fn, wo_from_cos_theta(0.8)[0])
        # Single-scatter GGX loses some energy to masking; bounded below.
        assert 0.85 < float(rho[0]) <= 1.01

    def test_function_consistency(self):
        ior = 1.5
        spec = float(fresnel.dielectric_specularity(1.0, ior))
        alpha = ggx.alpha_from_roughness(0.4)
        n = 2048
        u2 = pmj_u2(n)
        u3 = jnp.concatenate(
            [u2, jnp.asarray(np.random.default_rng(8).random((n, 1)), jnp.float32)],
            axis=-1)
        wo = wo_from_cos_theta(0.7, n)
        s = ggx.sample(alpha, spec, ior, wo, u3)
        resp = ggx.evaluate_with_pdf(alpha, spec, ior, wo, s.direction)
        valid = (np.asarray(s.pdf) > 1e-5) & ~np.asarray(s.is_delta)
        np.testing.assert_allclose(
            np.asarray(s.pdf)[valid], np.asarray(resp.pdf)[valid], rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(s.reflectance)[valid], np.asarray(resp.reflectance)[valid],
            rtol=1e-2, atol=1e-3)

    def test_smooth_glass_delta_lobes(self):
        ior = 1.5
        spec = float(fresnel.dielectric_specularity(1.0, ior))
        n = 4096
        u2 = pmj_u2(n)
        u3 = jnp.concatenate(
            [u2, jnp.asarray(np.random.default_rng(9).random((n, 1)), jnp.float32)],
            axis=-1)
        wo = wo_from_cos_theta(0.9, n)
        s = ggx.sample(jnp.float32(ggx.MIN_ALPHA / 2), spec, ior, wo, u3)
        assert np.all(np.asarray(s.is_delta))
        d = np.asarray(s.direction)
        refl = d[:, 2] > 0
        # Both lobes get sampled, reflections mirror wo, refractions obey Snell.
        assert 0.01 < refl.mean() < 0.5
        np.testing.assert_allclose(d[refl][:, 2], 0.9, atol=1e-6)
        sin_t = np.linalg.norm(d[~refl][:, :2], axis=1)
        np.testing.assert_allclose(sin_t, np.sqrt(1 - 0.81) / ior, atol=1e-5)
