"""Exposure estimation: fixed bias, log-average, 64-bin histogram.

Counterpart of the DX11 renderer's exposure passes
(``DX11Renderer/CameraEffects.cpp:304-370, 456-469``, SURVEY.md §2.5): the
GPU reduction / histogram compute shaders become jnp reductions.
Returns a linear exposure multiplier.
"""

from __future__ import annotations

import jax.numpy as jnp

from bifrost3d_tpu.math.color import luminance

HISTOGRAM_BINS = 64


def fixed_exposure(log_luminance_bias=0.0):
    return jnp.exp2(jnp.asarray(log_luminance_bias, jnp.float32))


def eye_adaptation(current_exposure, target_exposure, delta_time,
                   brightness_speed=3.0, darkness_speed=1.0):
    """Temporal eye adaptation (Shaders/CameraEffects/Utils.hlsl:45-50):
    lerp the exposure toward the target with an exponential rate that
    differs for brightening vs darkening (CameraEffects.h:71-73 defaults
    3.0 / 1.0)."""
    delta_exposure = target_exposure - current_exposure
    speed = jnp.where(delta_exposure > 0.0, brightness_speed, darkness_speed)
    factor = 1.0 - jnp.exp2(-jnp.asarray(delta_time, jnp.float32) * speed)
    return current_exposure + delta_exposure * factor


def _linear_exposure_from_average(average_luminance, log_luminance_bias):
    # Scale to key value 0.5 like the reference's eye-adaptation constant.
    key = 1.03 - 2.0 / (2.0 + jnp.log10(average_luminance + 1.0))
    return key / jnp.maximum(average_luminance, 1e-6) * jnp.exp2(log_luminance_bias)


def log_average_exposure(image, log_luminance_bias=0.0):
    """exp(mean(log(lum))) based exposure."""
    lum = luminance(image)
    log_avg = jnp.exp(jnp.mean(jnp.log(jnp.maximum(lum, 1e-6))))
    return _linear_exposure_from_average(log_avg, log_luminance_bias)


def luminance_histogram(image, min_log_luminance=-4.0, max_log_luminance=4.0,
                        bins=HISTOGRAM_BINS):
    """64-bin log2-luminance histogram (CameraEffects histogram pass)."""
    lum = luminance(image)
    log_lum = jnp.log2(jnp.maximum(lum, 1e-10))
    t = (log_lum - min_log_luminance) / (max_log_luminance - min_log_luminance)
    idx = jnp.clip((t * bins).astype(jnp.int32), 0, bins - 1)
    return jnp.zeros(bins, jnp.int32).at[idx.reshape(-1)].add(1)


def histogram_exposure(image, min_log_luminance=-4.0, max_log_luminance=4.0,
                       min_percentage=0.7, max_percentage=0.95,
                       log_luminance_bias=0.0, bins=HISTOGRAM_BINS):
    """Histogram exposure: average of the luminance between the
    [min_percentage, max_percentage] percentiles, rejecting outliers
    (CameraEffects.hlsl histogram exposure)."""
    hist = luminance_histogram(
        image, min_log_luminance, max_log_luminance, bins).astype(jnp.float32)
    total = jnp.sum(hist)
    lo = total * min_percentage
    hi = total * max_percentage
    cum_before = jnp.concatenate([jnp.zeros(1), jnp.cumsum(hist)[:-1]])
    # Per-bin contribution inside [lo, hi].
    contribution = jnp.clip(hi, cum_before, cum_before + hist) - \
        jnp.clip(lo, cum_before, cum_before + hist)
    bin_log_lum = min_log_luminance + (jnp.arange(bins) + 0.5) / bins * (
        max_log_luminance - min_log_luminance)
    bin_lum = jnp.exp2(bin_log_lum)
    avg = jnp.sum(contribution * bin_lum) / jnp.maximum(jnp.sum(contribution), 1e-6)
    # Reference semantics (ReduceExposureHistogram.hlsl:153): plain
    # exp2(bias)/average — the Krawczyk auto-key is only used by the
    # log-average path (ReduceLogAverageLuminance.hlsl:61-62).
    return jnp.exp2(jnp.asarray(log_luminance_bias, jnp.float32)) \
        / jnp.maximum(avg, 1e-6)
