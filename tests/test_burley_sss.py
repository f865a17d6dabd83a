"""BurleySSS profile tests (reference SubsurfaceScatteringTestBed checks):
profile normalization and sampler/pdf consistency."""

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.bsdf import burley_sss


class TestBurleySSS:
    def test_profile_normalizes_to_one(self):
        """∫ R(r) 2πr dr = 1 — the 'normalized' in normalized diffusion."""
        d = 0.7
        r = np.linspace(1e-5, 40 * d, 200000)
        prof = np.asarray(burley_sss.evaluate_profile(jnp.asarray(r), d))
        integral = np.trapezoid(prof * 2 * np.pi * r, r)
        np.testing.assert_allclose(integral, 1.0, rtol=1e-3)

    def test_sampling_matches_pdf(self):
        """MC with the analytic sampler: E[R(r)·rcp_pdf·2πr... ] — directly,
        E[f/pdf] over the sampled radius equals the profile integral (1)."""
        d = 0.4
        u = jnp.asarray(np.random.default_rng(0).random(100000), jnp.float32)
        radius, rcp_pdf = burley_sss.sample_diffusion_profile(u, d)
        f = np.asarray(burley_sss.evaluate_profile(radius, d))
        est = np.mean(f * np.asarray(rcp_pdf))
        np.testing.assert_allclose(est, 1.0, rtol=5e-3)

    def test_sampler_monotone_and_positive(self):
        d = 1.3
        u = jnp.linspace(0.001, 0.995, 64)
        r, _ = burley_sss.sample_diffusion_profile(u, d)
        r = np.asarray(r)
        assert np.all(r > 0)
        assert np.all(np.diff(r) > 0)

    def test_karis_approximation_close(self):
        d = 0.5
        u = jnp.linspace(0.01, 0.95, 32)
        exact, _ = burley_sss.sample_diffusion_profile(u, d)
        approx = burley_sss.sample_diffusion_profile_approximation(u, d)
        # Within ~20% over the bulk of the CDF (it's an approximation).
        rel = np.abs(np.asarray(approx) - np.asarray(exact)) / np.asarray(exact)
        assert np.median(rel) < 0.2

    def test_parameters_scaling(self):
        albedo = jnp.asarray([0.2, 0.5, 0.9])
        p = burley_sss.Parameters.create(albedo, jnp.asarray([1.0, 1.0, 1.0]))
        # Higher albedo → smaller s → longer diffuse mfp.
        dmfp = np.asarray(p.diffuse_mean_free_path)
        assert dmfp[2] > dmfp[0]
