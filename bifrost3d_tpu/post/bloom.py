"""Bloom: thresholded gaussian blur added back to the image.

Counterpart of the DX11 gaussian bloom (``CameraEffects.cpp:471-476``,
SURVEY.md §2.5). Separable gaussian as two 1D convolutions (XLA maps these
to efficient TPU convolutions).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_kernel(std_dev: float):
    radius = max(1, int(np.ceil(3.0 * std_dev)))
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / max(std_dev, 1e-6)) ** 2)
    return jnp.asarray((k / k.sum()).astype(np.float32))


def _blur_axis(image, kernel, axis):
    """Separable 1D gaussian along the given spatial axis [h, w, 3]."""
    pad = kernel.shape[0] // 2
    moved = jnp.moveaxis(image, axis, 0)
    padded = jnp.pad(moved, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    idx = jnp.arange(moved.shape[0])[:, None] + jnp.arange(kernel.shape[0])[None, :]
    gathered = padded[idx]                   # [n, k, w, 3]
    out = jnp.einsum("nkwc,k->nwc", gathered, kernel)
    return jnp.moveaxis(out, 0, axis)


def gaussian_bloom(image, threshold: float, support: float):
    """High-pass at ``threshold``, blur with std = support·height/4, add back.

    threshold = inf disables bloom (reference default).
    """
    if not np.isfinite(threshold) or support <= 0.0:
        return image
    height = image.shape[0]
    std_dev = support * height * 0.25
    kernel = _gaussian_kernel(std_dev)
    high = jnp.maximum(image - threshold, 0.0)
    base = image - high
    blurred = _blur_axis(_blur_axis(high, kernel, 0), kernel, 1)
    return base + blurred
