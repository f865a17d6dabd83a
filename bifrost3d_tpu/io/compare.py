"""Image comparison: RMS, SSIM, windowed MSSIM.

Counterpart of ``ImageOperations/Compare.h:23-184`` (SURVEY.md §2.6) — the
acceptance machinery for golden-image tests. Semantics match the reference:
RMS of per-pixel |error| luminance; SSIM over whole-image statistics;
MSSIM over gaussian-weighted windows (vectorized with convolutions).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.math.color import luminance

_C1 = 0.01
_C2 = 0.03


def rms(reference, target):
    """sqrt(mean(luminance(|a-b|)²)) (Compare.h rms)."""
    err = jnp.abs(jnp.asarray(reference) - jnp.asarray(target))
    l1 = luminance(err)
    return float(jnp.sqrt(jnp.mean(l1 * l1)))


def _ssim_from_stats(mu_a, mu_b, var_a, var_b, cov):
    return ((2.0 * mu_a * mu_b + _C1) * (2.0 * cov + _C2)
            / ((mu_a * mu_a + mu_b * mu_b + _C1) * (var_a + var_b + _C2)))


def ssim(reference, target):
    """Whole-image SSIM, luminance of the per-channel indices."""
    a = jnp.asarray(reference, jnp.float32)
    b = jnp.asarray(target, jnp.float32)
    mu_a = jnp.mean(a, axis=(0, 1))
    mu_b = jnp.mean(b, axis=(0, 1))
    var_a = jnp.mean(a * a, axis=(0, 1)) - mu_a * mu_a
    var_b = jnp.mean(b * b, axis=(0, 1)) - mu_b * mu_b
    cov = jnp.mean(a * b, axis=(0, 1)) - mu_a * mu_b
    return float(luminance(_ssim_from_stats(mu_a, mu_b, var_a, var_b, cov)))


def mssim(reference, target, support: int = 5):
    """Mean of windowed SSIM with the reference's gaussian weights.

    The reference's per-pixel double loop becomes five weighted
    convolutions (means, second moments, joint moment) over the same
    window/weight function (Compare.h:127-184).
    """
    a = np.asarray(reference, np.float64)
    b = np.asarray(target, np.float64)
    h, w = a.shape[:2]

    ys, xs = np.mgrid[-support + 1:support, -support + 1:support]
    dist2 = (xs / support) ** 2 + (ys / support) ** 2
    wv = 1.5 * 1.5
    # NOTE: reproduces the reference literally, including its unusual
    # positive exponent (Compare.h:158-160).
    kernel = np.exp(dist2 / (2.0 * wv)) / np.sqrt(2.0 * np.pi * wv)

    def wsum(img):
        """Weighted window sums with edge clipping (no padding weight)."""
        out = np.zeros_like(img)
        for dy in range(-support + 1, support):
            for dx in range(-support + 1, support):
                wgt = kernel[dy + support - 1, dx + support - 1]
                ys0, ys1 = max(0, -dy), min(h, h - dy)
                xs0, xs1 = max(0, -dx), min(w, w - dx)
                out[ys0:ys1, xs0:xs1] += wgt * img[ys0 + dy:ys1 + dy,
                                                   xs0 + dx:xs1 + dx]
        return out

    ones = np.ones((h, w, 1))
    wsum_1 = wsum(ones)
    mu_a = wsum(a) / wsum_1
    mu_b = wsum(b) / wsum_1
    var_a = wsum(a * a) / wsum_1 - mu_a * mu_a
    var_b = wsum(b * b) / wsum_1 - mu_b * mu_b
    cov = wsum(a * b) / wsum_1 - mu_a * mu_b
    s = _ssim_from_stats(mu_a, mu_b, var_a, var_b, cov)
    lum = np.asarray(luminance(jnp.asarray(s, jnp.float32)))
    return float(lum.mean())
