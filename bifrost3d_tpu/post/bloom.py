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


def _bilinear_sample(image, ys, xs):
    """Clamp-sampled bilinear fetch of [h, w, 3] at fractional pixel
    coords (the D3D clamp sampler used by the kawase shaders)."""
    from jax.scipy.ndimage import map_coordinates

    def chan(c):
        return map_coordinates(image[..., c], [ys, xs], order=1,
                               mode="nearest")

    return jnp.stack([chan(c) for c in range(3)], axis=-1)


def _kawase_downsample(image):
    """Dual-kawase half-res downsample (Bloom.hlsl:81-95): center tap x4 +
    four diagonal half-pixel taps, /8."""
    h, w = image.shape[0], image.shape[1]
    oh, ow = max(h // 2, 1), max(w // 2, 1)
    # Output texel centers in input pixel coordinates.
    ys = (jnp.arange(oh) + 0.5) * (h / oh) - 0.5
    xs = (jnp.arange(ow) + 0.5) * (w / ow) - 0.5
    yg, xg = jnp.meshgrid(ys, xs, indexing="ij")
    # half_pixel_width of the OUTPUT in input pixels.
    hy, hx = 0.5 * (h / oh), 0.5 * (w / ow)
    out = 4.0 * _bilinear_sample(image, yg, xg)
    for sy, sx in ((hy, hx), (hy, -hx), (-hy, hx), (-hy, -hx)):
        out = out + _bilinear_sample(image, yg + sy, xg + sx)
    return out / 8.0


def _kawase_upsample(image, oh, ow):
    """Dual-kawase upsample (Bloom.hlsl:98-117): 8 taps in a diamond, /12."""
    h, w = image.shape[0], image.shape[1]
    ys = (jnp.arange(oh) + 0.5) * (h / oh) - 0.5
    xs = (jnp.arange(ow) + 0.5) * (w / ow) - 0.5
    yg, xg = jnp.meshgrid(ys, xs, indexing="ij")
    hy, hx = 0.5 * (h / oh), 0.5 * (w / ow)
    taps = [((0.0, -2.0 * hx), 1.0), ((hy, -hx), 2.0),
            ((2.0 * hy, 0.0), 1.0), ((hy, hx), 2.0),
            ((0.0, 2.0 * hx), 1.0), ((-hy, hx), 2.0),
            ((-2.0 * hy, 0.0), 1.0), ((-hy, -hx), 2.0)]
    out = jnp.zeros((oh, ow, 3), image.dtype)
    for (sy, sx), wgt in taps:
        out = out + wgt * _bilinear_sample(image, yg + sy, xg + sx)
    return out / 12.0


def dual_kawase_bloom(image, threshold: float, half_passes: int = 3):
    """Dual-kawase bloom (CameraEffects.cpp DualKawaseBloom::filter +
    Bloom.hlsl:70-117): extract high intensity, ``half_passes`` 5-tap
    half-res downsamples, matching 8-tap upsamples, add back.

    threshold = inf disables bloom (reference default).
    """
    if not np.isfinite(threshold) or half_passes <= 0:
        return image
    high = jnp.maximum(image - threshold, 0.0)
    base = image - high
    levels = [high.shape[:2]]
    x = high
    for _ in range(half_passes):
        x = _kawase_downsample(x)
        levels.append(x.shape[:2])
    for oh, ow in reversed(levels[:-1]):
        x = _kawase_upsample(x, oh, ow)
    return base + x


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
