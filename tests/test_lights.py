"""Light tests — counterparts of tests/OptiXRendererTests/LightSources/*
and BifrostTests' InfiniteAreaLight "diffuse integrates to white" furnace
test (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.lights import (
    LIGHT_DIRECTIONAL,
    LIGHT_SPHERE,
    LIGHT_SPOT,
    LightArray,
    build_environment_light,
    direction_to_latlong_uv,
    environment_evaluate,
    environment_pdf,
    environment_sample,
    latlong_uv_to_direction,
    light_pdf,
    presample_environment,
    presampled_environment_sample,
    sample_light,
    sphere_light_sample,
)
from bifrost3d_tpu.sampling import pmj02_bn_samples


def _u2(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random((n, 2)), jnp.float32)


class TestLatLong:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(256, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        uv = direction_to_latlong_uv(jnp.asarray(d, jnp.float32))
        back = latlong_uv_to_direction(uv)
        np.testing.assert_allclose(np.asarray(back), d, atol=1e-5)

    def test_uv_in_range(self):
        d = jnp.asarray(np.random.default_rng(1).normal(size=(64, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        uv = np.asarray(direction_to_latlong_uv(d))
        assert np.all((uv >= 0) & (uv <= 1))


class TestSphereLight:
    def test_power_preservation_when_radius_changes(self):
        """Total irradiance from the light is set by its power, not radius
        (reference SphereLightTest power_preservation)."""
        n = 32768
        lit = jnp.zeros((n, 3), jnp.float32)
        power = jnp.asarray([100.0, 100.0, 100.0])
        est = []
        for radius in (0.5, 2.0, 5.0):
            pos = jnp.asarray([0.0, 10.0, 0.0])
            s = sphere_light_sample(pos, jnp.full((n,), radius), power, lit, _u2(n))
            # Irradiance on a surface facing the light:
            # E = ∫ L cosθ dω = L·π·sin²θmax = P/(4π d²) — radius-free.
            cos_theta = np.asarray(s.direction)[:, 1]
            contrib = np.asarray(s.radiance[:, 0]) * cos_theta / np.asarray(s.pdf)
            est.append(contrib.mean())
        expected = 100.0 / (4 * np.pi * 100.0)
        np.testing.assert_allclose(est, expected, rtol=0.01)

    def test_sample_directions_hit_sphere(self):
        n = 4096
        lit = jnp.zeros((n, 3), jnp.float32)
        pos = jnp.asarray([0.0, 10.0, 0.0])
        s = sphere_light_sample(pos, jnp.full((n,), 2.0), jnp.ones(3), lit, _u2(n, 1))
        # Every sampled direction lies in the subtended cone.
        cos_to_center = np.asarray(s.direction) @ np.asarray([0, 1.0, 0])
        cos_max = np.sqrt(1 - (2.0 / 10.0) ** 2)
        assert np.all(cos_to_center >= cos_max - 1e-5)
        # Distances within [d - r, d + r].
        assert np.all((np.asarray(s.distance) > 7.9) & (np.asarray(s.distance) < 10.1))

    def test_pdf_matches_sample(self):
        n = 4096
        lights = LightArray.build([
            {"kind": LIGHT_SPHERE, "position": (0, 10, 0), "radius": 2.0,
             "power": (50, 50, 50)}])
        lit = jnp.zeros((n, 3), jnp.float32)
        idx = jnp.zeros(n, jnp.int32)
        s = sample_light(lights, idx, lit, _u2(n, 2))
        p = light_pdf(lights, idx, lit, s.direction)
        np.testing.assert_allclose(np.asarray(p), np.asarray(s.pdf), rtol=1e-4)


class TestSpotLight:
    def test_cone_falloff(self):
        lights = LightArray.build([
            {"kind": LIGHT_SPOT, "position": (0, 5, 0), "radius": 0.5,
             "direction": (0, -1, 0), "cos_angle": 0.9, "power": (10, 10, 10)}])
        n = 8192
        lit = jnp.zeros((n, 3), jnp.float32)
        idx = jnp.zeros(n, jnp.int32)
        s = sample_light(lights, idx, lit, _u2(n, 3))
        # Receiver straight below: inside the cone, nonzero radiance.
        assert np.asarray(s.radiance).max() > 0
        # Receiver far to the side: outside the cone, black.
        lit_side = jnp.tile(jnp.asarray([100.0, 0.0, 0.0]), (n, 1))
        s2 = sample_light(lights, idx, lit_side, _u2(n, 4))
        assert np.asarray(s2.radiance).max() == 0

    def test_delta_spot(self):
        lights = LightArray.build([
            {"kind": LIGHT_SPOT, "position": (0, 5, 0), "radius": 0.0,
             "direction": (0, -1, 0), "cos_angle": 0.7, "power": (10, 10, 10)}])
        s = sample_light(lights, jnp.zeros(4, jnp.int32),
                         jnp.zeros((4, 3), jnp.float32), _u2(4, 5))
        assert np.all(np.asarray(s.is_delta))
        np.testing.assert_allclose(np.asarray(s.distance), 5.0, rtol=1e-5)


class TestDirectionalLight:
    def test_sample(self):
        lights = LightArray.build([
            {"kind": LIGHT_DIRECTIONAL, "direction": (0, -1, 0),
             "radiance": (2, 3, 4)}])
        s = sample_light(lights, jnp.zeros(8, jnp.int32),
                         jnp.zeros((8, 3), jnp.float32), _u2(8, 6))
        assert np.all(np.asarray(s.is_delta))
        np.testing.assert_allclose(np.asarray(s.direction), [[0, 1, 0]] * 8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.radiance), [[2, 3, 4]] * 8)


class TestEnvironmentLight:
    @pytest.fixture(scope="class")
    def sky(self):
        """A sky with a small bright 'sun' region and dim background."""
        h, w = 64, 128
        img = np.full((h, w, 3), 0.1, np.float32)
        img[20:24, 30:36] = 50.0  # sun
        return build_environment_light(img)

    def test_sample_pdf_consistency(self, sky):
        s = environment_sample(sky, _u2(8192, 7))
        p = environment_pdf(sky, s.direction)
        valid = np.asarray(s.pdf) > 0
        np.testing.assert_allclose(
            np.asarray(p)[valid], np.asarray(s.pdf)[valid], rtol=2e-2)

    def test_importance_targets_sun(self, sky):
        s = environment_sample(sky, _u2(8192, 8))
        lum = np.asarray(s.radiance).mean(axis=-1)
        # Most samples should land on the sun.
        assert (lum > 10).mean() > 0.5

    def test_diffuse_integrates_to_radiance_mean(self):
        """Furnace: uniform env of radiance c → ∫ L·pdf-weighted == c·4π...
        i.e. MC integral of radiance over the sphere with the env sampler
        equals the analytic total (InfiniteAreaLightTest.h analogue)."""
        img = np.full((16, 32, 3), 2.0, np.float32)
        light = build_environment_light(img)
        s = environment_sample(light, _u2(32768, 9))
        integral = np.mean(np.asarray(s.radiance[:, 0]) / np.asarray(s.pdf))
        np.testing.assert_allclose(integral, 2.0 * 4 * np.pi, rtol=0.02)

    def test_presampled_pool_matches_distribution(self, sky):
        pool = presample_environment(sky, sample_count=1024)
        assert pool.nee_enabled
        s = presampled_environment_sample(
            pool, jnp.asarray(np.random.default_rng(10).random(4096), jnp.float32))
        lum = np.asarray(s.radiance).mean(axis=-1)
        assert (lum > 10).mean() > 0.5
        # Pool-based estimator still integrates the uniform furnace correctly.
        img = np.full((16, 32, 3), 1.5, np.float32)
        light = build_environment_light(img)
        pool2 = presample_environment(light, sample_count=2048)
        s2 = presampled_environment_sample(
            pool2, jnp.asarray(np.random.default_rng(11).random(8192), jnp.float32))
        integral = np.mean(np.asarray(s2.radiance[:, 0]) / np.asarray(s2.pdfs if False else s2.pdf))
        np.testing.assert_allclose(integral, 1.5 * 4 * np.pi, rtol=0.05)
