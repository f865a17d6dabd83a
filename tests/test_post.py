"""Camera-effects tests — counterparts of DX11RendererTests' compute-pass
tests (SURVEY.md §4: histogram vs CPU histogram, bloom energy conservation,
tonemapper behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.post import (
    CameraEffectsSettings,
    TonemappingSettings,
    agx,
    filmic,
    gaussian_bloom,
    histogram_exposure,
    khronos_neutral,
    log_average_exposure,
    luminance_histogram,
    process,
    reinhard,
)
from bifrost3d_tpu.math.color import luminance


def hdr_image(seed=0, h=24, w=32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.lognormal(mean=-1.0, sigma=1.5, size=(h, w, 3)),
                       jnp.float32)


class TestTonemappers:
    @pytest.mark.parametrize("op", [
        # Extended Reinhard maps [0, W] into [0, 1] for white level W.
        lambda c: reinhard(c, white_level_sqrd=400.0),
        lambda c: filmic(c),
        agx,
        khronos_neutral])
    def test_range_and_monotonicity(self, op):
        # Grayscale ramp maps into [0, ~1] monotonically.
        ramp = jnp.linspace(0.0, 20.0, 256)[:, None] * jnp.ones(3)
        out = np.asarray(op(ramp))
        assert np.all(out >= -1e-3)
        assert np.all(out <= 1.2)
        lum = out.mean(axis=-1)
        assert np.all(np.diff(lum) >= -1e-3), "not monotonic"

    @pytest.mark.parametrize("op", [
        lambda c: reinhard(c), lambda c: filmic(c), agx, khronos_neutral])
    def test_black_maps_to_black(self, op):
        out = np.asarray(op(jnp.zeros((4, 3))))
        np.testing.assert_allclose(out, 0.0, atol=0.01)

    def test_khronos_neutral_below_knee_applies_black_offset_only(self):
        # Below the compression knee the operator only subtracts the black
        # offset (0.04 once min-channel > 0.08) — matches the reference.
        c = jnp.asarray([[0.2, 0.3, 0.1]])
        np.testing.assert_allclose(
            np.asarray(khronos_neutral(c)), np.asarray(c) - 0.04, atol=1e-5)

    def test_filmic_mid_grey_preserved(self):
        # The UE4 curve maps 0.18 input ≈ 0.18 output by construction.
        out = np.asarray(filmic(jnp.full((1, 3), 0.18)))
        np.testing.assert_allclose(out, 0.18, atol=0.02)


class TestExposure:
    def test_histogram_matches_numpy(self):
        img = hdr_image(1)
        hist = np.asarray(luminance_histogram(img, -4.0, 4.0))
        lum = np.asarray(luminance(img))
        np_hist, _ = np.histogram(
            np.clip(np.log2(np.maximum(lum, 1e-10)), -4.0, 3.999), bins=64,
            range=(-4.0, 4.0))
        # Clamp semantics at the edges make the interior bins identical.
        np.testing.assert_array_equal(hist[1:-1], np_hist[1:-1])
        assert hist.sum() == lum.size

    def test_exposure_normalizes_brightness(self):
        # Scales chosen so most luminances stay inside the histogram's
        # [-4, 4] log2 range (outside it the clamped bins limit adaptation,
        # as in the reference).
        for scale in (0.2, 1.0, 5.0):
            img = hdr_image(2) * scale
            e = float(histogram_exposure(img))
            exposed = np.asarray(img) * e
            # After exposure the average luminance lands near mid-grey.
            assert 0.05 < luminance(jnp.asarray(exposed)).mean() < 1.0

    def test_log_average_tracks_scale(self):
        img = hdr_image(3)
        e1 = float(log_average_exposure(img))
        e2 = float(log_average_exposure(img * 4.0))
        assert e2 < e1


class TestBloom:
    def test_disabled_with_infinite_threshold(self):
        img = hdr_image(4)
        out = gaussian_bloom(img, np.inf, 0.05)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_energy_conservation(self):
        """Blur preserves the thresholded energy (reference bloom test)."""
        img = jnp.zeros((33, 33, 3)).at[16, 16].set(100.0)
        out = np.asarray(gaussian_bloom(img, 1.0, 0.2))
        # Total energy preserved within boundary-padding tolerance.
        np.testing.assert_allclose(out.sum(), 100.0 * 3, rtol=0.02)
        # And spread out: center pixel far below the original.
        assert out[16, 16, 0] < 50.0

    def test_mirrored_input_gives_mirrored_output(self):
        img = hdr_image(5, 16, 16) * 5.0
        a = np.asarray(gaussian_bloom(img, 0.5, 0.2))
        b = np.asarray(gaussian_bloom(img[:, ::-1], 0.5, 0.2))
        np.testing.assert_allclose(a, b[:, ::-1], atol=1e-4)


class TestPipeline:
    def test_preset_chain_outputs_displayable(self):
        img = hdr_image(6)
        out = np.asarray(process(img, CameraEffectsSettings.preset()))
        assert out.shape == img.shape
        assert np.all((out >= 0.0) & (out <= 1.0))

    def test_linear_chain_is_identity_below_one(self):
        img = jnp.clip(hdr_image(7), 0.0, 0.9)
        out = np.asarray(process(img, CameraEffectsSettings.linear()))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)

    def test_vignette_darkens_corners(self):
        s = CameraEffectsSettings.linear()._replace(vignette=0.8)
        img = jnp.full((32, 32, 3), 0.5)
        out = np.asarray(process(img, s))
        assert out[0, 0].mean() < out[16, 16].mean()


def test_eye_adaptation_lerps_toward_target():
    from bifrost3d_tpu.post.exposure import eye_adaptation
    # Brightening uses the faster rate (3.0) than darkening (1.0).
    up = float(eye_adaptation(1.0, 2.0, delta_time=0.1))
    down = float(eye_adaptation(2.0, 1.0, delta_time=0.1))
    assert 1.0 < up < 2.0
    assert 1.0 < down < 2.0
    assert (up - 1.0) > (2.0 - down)  # brightness adapts faster
    # Large delta_time converges to the target.
    assert abs(float(eye_adaptation(1.0, 2.0, 100.0)) - 2.0) < 1e-4


def test_process_stateful_snaps_then_adapts():
    import jax.numpy as jnp
    from bifrost3d_tpu.post.pipeline import process_stateful
    from bifrost3d_tpu.post.tonemap import CameraEffectsSettings

    img = jnp.full((16, 16, 3), 0.25, jnp.float32)
    settings = CameraEffectsSettings.preset()
    _, e0 = process_stateful(img, settings, 0, -1.0, 1 / 60)
    # Brighter scene → lower target exposure; adaptation moves only partway.
    bright = img * 8.0
    _, e1 = process_stateful(bright, settings, 1, e0, 1 / 60)
    _, e_target = process_stateful(bright, settings, 1, -1.0, 1 / 60)
    assert float(e_target) < float(e0)
    assert float(e_target) < float(e1) < float(e0)


def test_dual_kawase_bloom_conserves_energy_roughly():
    import numpy as np
    import jax.numpy as jnp
    from bifrost3d_tpu.post.bloom import dual_kawase_bloom

    img = jnp.zeros((64, 64, 3), jnp.float32).at[32, 32].set(10.0)
    out = np.asarray(dual_kawase_bloom(img, threshold=0.5, half_passes=2))
    assert np.isfinite(out).all()
    # The bright spot spreads but total energy stays within a few percent
    # (clamp-sampling at borders loses a little).
    assert out.max() < 10.0
    assert abs(out.sum() - float(img.sum())) / float(img.sum()) < 0.1
    # Spread is symmetric-ish around the spot.
    assert out[30, 32, 0] > 0.01 and out[34, 32, 0] > 0.01


def test_dual_kawase_disabled_threshold():
    import numpy as np
    import jax.numpy as jnp
    from bifrost3d_tpu.post.bloom import dual_kawase_bloom

    img = jnp.ones((8, 8, 3), jnp.float32)
    out = dual_kawase_bloom(img, threshold=np.inf, half_passes=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_filmic_matches_reference_implementation():
    """Our filmic is a 2e-7-exact port of Math/CameraEffects.h:161-217 —
    pinned so golden-tier tonemapper choices can't be blamed on drift."""
    import numpy as np
    import jax.numpy as jnp
    from bifrost3d_tpu.post.tonemap import (
        TONEMAP_FILMIC, TonemappingSettings, apply_tonemap)

    D65_to_D60 = np.array([[1.01303, 0.00610531, -0.014971],
                           [0.00769823, 0.998165, -0.00503203],
                           [-0.00284131, 0.00468516, 0.924507]])
    sRGB_to_XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                            [0.2126729, 0.7151522, 0.0721750],
                            [0.0193339, 0.1191920, 0.9503041]])
    XYZ_to_AP1 = np.array([[1.6410233797, -0.3248032942, -0.2364246952],
                           [-0.6636628587, 1.6153315917, 0.0167563477],
                           [0.0117218943, -0.0082844420, 0.9883948585]])
    AP1_to_XYZ = np.array([[0.6624541811, 0.1340042065, 0.1561876870],
                           [0.2722287168, 0.6740817658, 0.0536895174],
                           [-0.0055746495, 0.0040607335, 1.0103391003]])
    sRGB_to_AP1 = XYZ_to_AP1 @ D65_to_D60 @ sRGB_to_XYZ
    AP1_to_sRGB = np.linalg.inv(sRGB_to_AP1)
    AP1_RGB2Y = AP1_to_XYZ[1]

    def ref_filmic(c, slope=0.91, toe=0.53, shoulder=0.23,
                   black_clip=0.0, white_clip=0.035):
        wc = np.maximum(0, sRGB_to_AP1 @ c)
        y = np.dot(wc, AP1_RGB2Y)
        wc = y + (wc - y) * 0.96
        toe_scale = 1 + black_clip - toe
        shoulder_scale = 1 + white_clip - shoulder
        bt = (0.18 + black_clip) / toe_scale - 1
        toe_match = (np.log10(0.18)
                     - 0.5 * np.log((1 + bt) / (1 - bt)) * (toe_scale / slope))
        straight_match = (1 - toe) / slope - toe_match
        shoulder_match = shoulder / slope - straight_match
        log_c = np.log10(np.maximum(wc, 1e-10))
        straight = (log_c + straight_match) * slope
        toe_c = -black_clip + (2 * toe_scale) / (
            1 + np.exp((log_c - toe_match) * (-2 * slope / toe_scale)))
        toe_c = np.where(log_c < toe_match, toe_c, straight)
        sh_c = (1 + white_clip) - (2 * shoulder_scale) / (
            1 + np.exp((log_c - shoulder_match) * (2 * slope / shoulder_scale)))
        sh_c = np.where(log_c > shoulder_match, sh_c, straight)
        t = np.clip((log_c - toe_match) / (shoulder_match - toe_match), 0, 1)
        if shoulder_match < toe_match:
            t = 1 - t
        t = (3 - t * 2) * t * t
        tone = toe_c + (sh_c - toe_c) * t
        y = np.dot(tone, AP1_RGB2Y)
        tone = y + (tone - y) * 0.93
        return AP1_to_sRGB @ np.maximum(0, tone)

    rng = np.random.default_rng(0)
    cols = rng.random((64, 3)).astype(np.float32) * 3.0
    ours = np.asarray(apply_tonemap(jnp.asarray(cols), TONEMAP_FILMIC,
                                    TonemappingSettings.aces()))
    refs = np.stack([ref_filmic(c) for c in cols])
    np.testing.assert_allclose(ours, refs, atol=1e-5)
