"""Tests for the auxiliary subsystems: AOVs, media conversions, smallvpt,
statistics, Nelder-Mead, denoised backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.apps.scenes import create_cornell_box
from bifrost3d_tpu.integrator.aov import render_aovs
from bifrost3d_tpu.integrator.backend import DenoisedBackend, SimpleBackend, atrous_denoise
from bifrost3d_tpu.integrator.path_tracer import RenderSettings
from bifrost3d_tpu.integrator.smallvpt import render_smallvpt
from bifrost3d_tpu.math.nelder_mead import nelder_mead
from bifrost3d_tpu.math.statistics import Statistics
from bifrost3d_tpu.scene import smallpt_scene
from bifrost3d_tpu.scene.media import (
    ArtisticScatteringParameters,
    MEASURED_PRESETS,
    MeasuredScatteringParameters,
)


@pytest.fixture(scope="module")
def cornell():
    return create_cornell_box()


class TestAOVs:
    def test_aov_shapes_and_content(self, cornell):
        scene, cam = cornell
        aovs = render_aovs(scene, cam, 32, 32)
        assert set(aovs) == {"depth", "albedo", "tint", "roughness",
                             "shading_normal", "primitive_id"}
        depth = np.asarray(aovs["depth"])
        assert depth.shape == (32, 32)
        # The open box front lets a few corner rays escape; almost all
        # pixels hit and land strictly inside (0, 1).
        inside = (depth > 0) & (depth < 1)
        assert inside.mean() > 0.95
        # Normals are unit where hit.
        n = np.asarray(aovs["shading_normal"])
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1)[inside], 1.0, atol=1e-4)
        # Left wall tint red-ish, right wall green (CornellBox materials).
        tint = np.asarray(aovs["tint"])
        assert tint[16, 2, 0] > 0.9 and tint[16, 2, 1] < 0.1   # red left
        assert tint[16, 29, 1] > 0.9 and tint[16, 29, 0] < 0.1  # green right

    def test_primitive_id_distinct(self, cornell):
        scene, cam = cornell
        aovs = render_aovs(scene, cam, 32, 32)
        ids = np.asarray(aovs["primitive_id"]).reshape(-1, 3)
        # 32x32 of a mostly-flat box: at least a handful of distinct
        # primitive colors (walls are 2 triangles each).
        assert len(np.unique((ids * 1023).astype(int), axis=0)) >= 7


class TestMedia:
    def test_roundtrip_artistic_measured(self):
        for name, measured in list(MEASURED_PRESETS.items())[:4]:
            art = ArtisticScatteringParameters.from_measured(measured)
            back = MeasuredScatteringParameters.from_artistic(art)
            # Attenuation (1/mfp) survives the roundtrip exactly.
            np.testing.assert_allclose(
                np.asarray(back.attenuation_coefficient),
                np.asarray(measured.attenuation_coefficient), rtol=1e-5)

    def test_albedo_sanity(self):
        milk = MEASURED_PRESETS["wholemilk"]
        a = np.asarray(milk.single_scattering_albedo)
        assert np.all((a > 0.99) & (a <= 1.0))  # milk is highly scattering
        d = np.asarray(milk.diffuse_albedo())
        assert np.all((d > 0.5) & (d < 1.0))


class TestSmallVpt:
    def test_renders_fog_scene(self):
        img = np.asarray(render_smallvpt(smallpt_scene(), 48, 36, 8))
        assert np.isnan(img).sum() == 0
        assert 0.01 < img.mean() < 1.0
        # The ceiling light region is the brightest.
        assert img[32:36, 16:32].mean() > img[4:12, 16:32].mean()


class TestStatistics:
    def test_mean_variance_and_merge(self):
        rng = np.random.default_rng(0)
        a = rng.normal(3.0, 2.0, 500)
        b = rng.normal(3.0, 2.0, 700)
        sa = Statistics.of(a)
        sb = Statistics.of(b)
        merged = sa.merge(sb)
        ref = Statistics.of(np.concatenate([a, b]))
        np.testing.assert_allclose(merged.mean, ref.mean, rtol=1e-10)
        np.testing.assert_allclose(merged.variance, ref.variance, rtol=1e-10)
        assert merged.count == 1200


class TestNelderMead:
    def test_minimizes_rosenbrock(self):
        def rosenbrock(x):
            return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2
        x, fx = nelder_mead(rosenbrock, [-1.0, 2.0], step=0.5,
                            max_iterations=2000, tolerance=1e-14)
        np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-2)
        assert fx < 1e-4


class TestDenoiser:
    def test_atrous_reduces_noise_preserves_edges(self):
        rng = np.random.default_rng(1)
        h = w = 32
        # Two flat regions with an albedo/normal edge + noise.
        clean = np.zeros((h, w, 3), np.float32)
        clean[:, :16] = 0.2
        clean[:, 16:] = 0.8
        noisy = clean + rng.normal(0, 0.1, clean.shape).astype(np.float32)
        albedo = clean.copy()
        normal = np.zeros((h, w, 3), np.float32)
        normal[..., 2] = 1.0
        out = np.asarray(atrous_denoise(
            jnp.asarray(noisy), jnp.asarray(normal), jnp.asarray(albedo)))
        # Noise reduced…
        assert out[:, :14].std() < 0.4 * noisy[:, :14].std()
        # …edge preserved.
        assert abs(out[:, 18:].mean() - 0.8) < 0.05
        assert abs(out[:, :14].mean() - 0.2) < 0.05

    def test_denoised_backend_cadence(self, cornell):
        scene, cam = cornell
        backend = DenoisedBackend(scene, cam, 16, 16,
                                  RenderSettings(max_bounce_count=1))
        img1 = backend.render()
        assert np.asarray(img1).shape == (16, 16, 3)
        img2 = backend.render()
        assert backend.accumulations == 2
        backend.reset()
        assert backend.accumulations == 0


def test_dev_analysis_tools_run():
    """apps/dev analysis counterparts (SURVEY §2.7): run all three and
    sanity-gate the headline numbers."""
    from bifrost3d_tpu.apps.dev_analysis import (
        normals_analysis, seeding_analysis, sss_analysis)

    seeds = seeding_analysis(width=32, height=32, sample_count=4)
    assert seeds["jenkins"]["error_std"] > 0
    assert abs(seeds["jenkins"]["neighbor_corr"]) < 0.15  # decorrelated

    normals = normals_analysis(n=20_000)
    assert normals["oct32 (2x int16)"]["max_deg"] < 0.05  # int16 precision
    assert normals["xyz24 (3x unorm8)"]["mean_deg"] > \
        normals["oct32 (2x int16)"]["mean_deg"]

    sss = sss_analysis(n=1 << 14)
    assert abs(sss["exact-cdf"]["profile_integral"] - 1.0) < 1e-3
    # Exact and approximate samplers agree on the mean radius within a few %.
    assert abs(sss["exact-cdf"]["mean_r"]
               - sss["approx-c2.6"]["mean_r"]) < 0.1
