"""Thin-sheet reflectance tests.

Ports of the reference's thin-sheet suite (ShadingModels/UtilsTest.h and
the harness BSDFTestUtils.h:167-264): a multi-bounce simulation of light
bouncing inside a thin slab is checked against the closed-form geometric
series, and the rho-table approximation against the closed form.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bifrost3d_tpu.bsdf import ggx, lambert
from bifrost3d_tpu.bsdf.fresnel import dielectric_specularity
from bifrost3d_tpu.sampling.sobol import path_rng_4d
from bifrost3d_tpu.scene.materials import AIR_IOR
from bifrost3d_tpu.shading.thin_sheet import (
    approx_thin_sheet_reflectance,
    smooth_thin_sheet_reflectance,
)

COAT_IOR = 1.5
# The dielectric rho table's IOR range endpoints (fittings.py mirrors
# Rho::dielectric_GGX_{minimum,maximum}_IOR_into_dense_medium).
DENSE_IORS = (1.2, COAT_IOR, 3.0)


def _w_from_cos(c):
    return jnp.asarray([np.sqrt(1.0 - c * c), 0.0, c], jnp.float32)


def integrate_over_thin_sheet(sampler, wo, path_count, bounce_count=8):
    """Vectorized port of BSDFTestUtils::integrate_over_thin_sheet: traces
    ``path_count`` paths bouncing between the two faces of a thin sheet and
    splits the escaped throughput into reflected/transmitted."""
    n = path_count
    throughput = jnp.ones((n, 3), jnp.float32)
    ray_wo = jnp.broadcast_to(wo, (n, 3))
    terminated = jnp.zeros(n, bool)
    escaped_is_reflection = jnp.zeros(n, bool)
    idx = jnp.arange(n, dtype=jnp.uint32)

    for bounce in range(bounce_count):
        hemisphere_sign = 1.0 if bounce == 0 else -1.0
        ray_wo = ray_wo.at[:, 2].set(
            hemisphere_sign * jnp.abs(ray_wo[:, 2]))

        u4 = path_rng_4d(idx, jnp.uint32(0), jnp.uint32(bounce))
        s = sampler(ray_wo, u4[:, :3])

        valid = s.pdf > 0.0
        w = s.reflectance * (jnp.abs(s.direction[:, 2])
                             / jnp.maximum(s.pdf, 1e-12))[:, None]
        new_throughput = jnp.where(valid[:, None], throughput * w, 0.0)
        throughput = jnp.where(terminated[:, None], throughput,
                               new_throughput)

        is_inside = bounce > 0
        transmission_out = is_inside & (
            jnp.sign(s.direction[:, 2]) != jnp.sign(ray_wo[:, 2]))
        initial_reflection = (bounce == 0) & (s.direction[:, 2] >= 0.0)
        newly_done = ~terminated & (
            ~valid | transmission_out | initial_reflection)

        escaped_is_reflection = jnp.where(
            terminated, escaped_is_reflection, (bounce % 2) == 0)
        ray_wo = jnp.where(terminated[:, None], ray_wo, s.direction)
        terminated = terminated | newly_done

    reflected = jnp.mean(
        jnp.where(escaped_is_reflection[:, None], throughput, 0.0), axis=0)
    transmitted = jnp.mean(
        jnp.where(escaped_is_reflection[:, None], 0.0, throughput), axis=0)
    return np.asarray(reflected), np.asarray(transmitted)


def test_lambertian_thin_sheet_reflects_all_energy():
    """UtilsTest.h lambertian_thin_sheet_reflects_all_energy: a diffuse
    sheet never transmits — everything eventually reflects with the tint."""
    tint = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)

    def sampler(wo, u3):
        return lambert.sample(tint, wo, u3[..., :2])

    reflected, transmitted = integrate_over_thin_sheet(
        sampler, _w_from_cos(1.0), path_count=2048)
    np.testing.assert_allclose(reflected, np.asarray(tint), atol=1e-3)
    np.testing.assert_allclose(transmitted, 0.0, atol=1e-6)


@pytest.mark.parametrize("medium_ior", DENSE_IORS)
def test_smooth_ggx_thin_sheet_matches_closed_form(medium_ior):
    """UtilsTest.h smooth_ggx_thin_sheet_reflects_according_to_expectation."""
    tint = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    tint_per_side = jnp.sqrt(tint)
    alpha = 0.0
    specularity = float(dielectric_specularity(AIR_IOR, medium_ior))

    def sampler(wo, u3):
        entering = wo[..., 2:3] >= 0.0
        ior = jnp.where(entering[..., 0], medium_ior / AIR_IOR,
                        AIR_IOR / medium_ior)
        return ggx.sample(jnp.full(wo.shape[:-1], alpha, jnp.float32),
                          specularity, ior, wo, u3,
                          transmission_tint=jnp.broadcast_to(
                              tint_per_side, wo.shape))

    for cos_theta in (0.3, 0.5, 1.0):
        reflected, transmitted = integrate_over_thin_sheet(
            sampler, _w_from_cos(cos_theta), path_count=4096,
            bounce_count=32)
        expected = smooth_thin_sheet_reflectance(cos_theta, medium_ior, tint)
        np.testing.assert_allclose(
            reflected, np.asarray(expected.reflected), atol=0.01)
        np.testing.assert_allclose(
            transmitted, np.asarray(expected.transmitted), atol=0.01)


@pytest.mark.parametrize("medium_ior", DENSE_IORS)
def test_approx_thin_sheet_matches_closed_form_for_smooth(medium_ior):
    """UtilsTest.h approx_smooth_ggx_thin_sheet_is_nearly_exact...: the
    rho-table approximation at roughness 0 vs the analytic series."""
    tint = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    for cos_theta in (0.3, 0.5, 1.0):
        expected = smooth_thin_sheet_reflectance(cos_theta, medium_ior, tint)
        approx = approx_thin_sheet_reflectance(
            jnp.asarray(cos_theta), jnp.asarray(0.0),
            jnp.asarray(medium_ior), tint)
        np.testing.assert_allclose(np.asarray(approx.reflected),
                                   np.asarray(expected.reflected), atol=0.025)
        np.testing.assert_allclose(np.asarray(approx.transmitted),
                                   np.asarray(expected.transmitted),
                                   atol=0.025)


def test_thin_sheet_energy_conservation():
    """With a white tint everything must leave the sheet: Re + Te == 1."""
    for medium_ior in DENSE_IORS:
        for cos_theta in (0.1, 0.3, 0.7, 1.0):
            for roughness in (0.0, 0.4, 1.0):
                ts = approx_thin_sheet_reflectance(
                    jnp.asarray(cos_theta), jnp.asarray(roughness),
                    jnp.asarray(medium_ior), jnp.ones(3))
                total = np.asarray(ts.reflected + ts.transmitted)
                np.testing.assert_allclose(total, 1.0, atol=0.02)


class TestThinWalledTransmissiveShading:
    def _make(self, cos_theta, roughness, tint=(1.0, 1.0, 1.0)):
        from bifrost3d_tpu.shading.transmissive_shading import (
            TransmissiveShading)
        from bifrost3d_tpu.scene.materials import GLASS_SPECULARITY
        return TransmissiveShading.create(
            tint=jnp.asarray(tint, jnp.float32),
            roughness=jnp.asarray(roughness),
            specularity=jnp.asarray(GLASS_SPECULARITY),
            cos_theta_o=jnp.asarray(cos_theta),
            thin_walled=jnp.asarray(True))

    def test_white_thin_sheet_rho_is_one(self):
        for cos_theta in (0.3, 0.7, 1.0):
            for roughness in (0.0, 0.5, 1.0):
                sh = self._make(cos_theta, roughness)
                rho = np.asarray(sh.rho(jnp.asarray(cos_theta)))
                np.testing.assert_allclose(rho, 1.0, atol=0.02)

    def test_smooth_thin_sheet_transmits_straight_through(self):
        sh = self._make(0.6, 0.0)
        wo = _w_from_cos(0.6)[None]
        # Force the transmission branch (u3[2] past reflect probability).
        s = sh.sample(wo, jnp.asarray([[0.4, 0.4, 0.999]]))
        np.testing.assert_allclose(
            np.asarray(s.direction[0]), np.asarray(-wo[0]), atol=1e-6)
        assert bool(s.is_delta[0])

    def test_sampled_energy_matches_thin_sheet_weights(self):
        """MC rho of the thin BSDF == reflected+transmitted of the sheet."""
        from bsdf_test_utils import directional_hemispherical_reflectance
        sh = self._make(0.5, 0.6, tint=(1.0, 0.5, 0.25))
        rho, _ = directional_hemispherical_reflectance(
            sh.sample, _w_from_cos(0.5), sample_count=16384)
        expected = np.asarray(sh.thin_reflected + sh.thin_transmitted)
        np.testing.assert_allclose(rho, expected, atol=0.02)
