"""The camera-effects chain: exposure → bloom → tonemap → vignette → grain.

Counterpart of ``DX11Renderer/CameraEffects::process``
(CameraEffects.cpp:413-507, SURVEY.md §2.5): one fused jnp pipeline from
HDR radiance [h, w, 3] to displayable linear color in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bifrost3d_tpu.post.bloom import dual_kawase_bloom, gaussian_bloom
from bifrost3d_tpu.post.exposure import (
    eye_adaptation,
    fixed_exposure,
    histogram_exposure,
    log_average_exposure,
)
from bifrost3d_tpu.post.tonemap import (
    EXPOSURE_FIXED,
    EXPOSURE_HISTOGRAM,
    EXPOSURE_LOG_AVERAGE,
    CameraEffectsSettings,
    apply_tonemap,
)
from bifrost3d_tpu.sampling.hashes import pcg2d, uint_to_unit_float


def process(image, settings: CameraEffectsSettings = CameraEffectsSettings.preset(),
            frame_index: int = 0):
    """HDR radiance [h, w, 3] → display-ready linear [0, 1].

    One fused jit: the chain is ~1500 small ops, and running them eagerly
    costs a device round trip EACH on a tunneled TPU (measured 311 s for a
    64² image; jitted it is milliseconds). ``settings`` is static (plain
    Python scalars), so mode branches resolve at trace time.
    """
    ldr, _ = _process_jit(image, settings, jnp.uint32(frame_index),
                          jnp.float32(-1.0), jnp.float32(0.0))
    return ldr


def process_stateful(image, settings: CameraEffectsSettings,
                     frame_index: int, previous_exposure, delta_time):
    """Like :func:`process` but with temporal eye adaptation
    (CameraEffects.cpp:456-469 + Utils.hlsl eye_adaptation): the exposure
    lerps from ``previous_exposure`` toward the frame's target at the
    settings' brightness/darkness speeds. Pass ``previous_exposure < 0``
    on the first frame (adaptation snaps to the target). Returns
    (ldr_image, applied_exposure) — feed the exposure back next frame."""
    return _process_jit(image, settings, jnp.uint32(frame_index),
                        jnp.asarray(previous_exposure, jnp.float32),
                        jnp.asarray(delta_time, jnp.float32))


@partial(jax.jit, static_argnames=("settings",))
def _process_jit(image, settings: CameraEffectsSettings, frame_index,
                 previous_exposure, delta_time):
    h, w = image.shape[0], image.shape[1]

    # 1) Exposure.
    if settings.exposure_mode == EXPOSURE_FIXED:
        exposure = fixed_exposure(settings.log_luminance_bias)
    elif settings.exposure_mode == EXPOSURE_LOG_AVERAGE:
        exposure = log_average_exposure(image, settings.log_luminance_bias)
    elif settings.exposure_mode == EXPOSURE_HISTOGRAM:
        exposure = histogram_exposure(
            image, settings.min_log_luminance, settings.max_log_luminance,
            settings.min_histogram_percentage, settings.max_histogram_percentage,
            settings.log_luminance_bias)
    else:
        raise ValueError(f"unknown exposure mode {settings.exposure_mode}")
    if settings.eye_adaptation_enabled:
        adapted = eye_adaptation(previous_exposure, exposure, delta_time,
                                 settings.eye_adaptation_brightness,
                                 settings.eye_adaptation_darkness)
        # previous < 0 = no history (first frame): snap to the target.
        exposure = jnp.where(previous_exposure >= 0.0, adapted, exposure)
    image = image * exposure

    # 2) Bloom.
    if settings.bloom_mode == 1:
        half_passes = max(1, int(round(settings.bloom_support * h / 128.0))) \
            if settings.bloom_support > 0 else 0
        image = dual_kawase_bloom(image, settings.bloom_threshold,
                                  half_passes)
    else:
        image = gaussian_bloom(image, settings.bloom_threshold,
                               settings.bloom_support)

    # 3) Vignette (matching the DX11 tonemap pass's radial falloff).
    if settings.vignette > 0.0:
        ys = (jnp.arange(h) + 0.5) / h - 0.5
        xs = (jnp.arange(w) + 0.5) / w - 0.5
        r2 = (xs[None, :] ** 2 + ys[:, None] ** 2) * 2.0
        falloff = 1.0 - settings.vignette * r2
        image = image * jnp.clip(falloff, 0.0, 1.0)[..., None]

    # 4) Tonemap.
    image = apply_tonemap(image, settings.tonemapping_mode, settings.tonemapping)

    # 5) Film grain: per-pixel hash noise in ±grain.
    if settings.film_grain > 0.0:
        xi = jnp.arange(w, dtype=jnp.uint32)[None, :]
        yi = jnp.arange(h, dtype=jnp.uint32)[:, None]
        hashv, _ = pcg2d(xi * jnp.uint32(9781) + jnp.uint32(frame_index),
                         yi * jnp.uint32(6271) + jnp.uint32(frame_index * 31))
        noise = uint_to_unit_float(hashv) - 0.5
        image = image + (2.0 * settings.film_grain) * noise[..., None]

    return jnp.clip(image, 0.0, 1.0), exposure
