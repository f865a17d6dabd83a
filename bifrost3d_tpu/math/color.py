"""Color conversions — counterpart of the reference's ``Math/Color.h``.

Colors are arrays with a trailing axis of 3 (RGB) or 4 (RGBA), linear unless
stated otherwise. Byte formats (RGB24/RGBA32/UNorm8 of the reference) map to
uint8 arrays; conversion helpers live in :mod:`bifrost3d_tpu.io.image`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Rec.709 / sRGB luminance weights, as used by the reference's
# Math/Color.h luminance().
_LUMA = np.asarray([0.2126, 0.7152, 0.0722], dtype=np.float32)


def luminance(rgb):
    return jnp.sum(rgb[..., :3] * _LUMA, axis=-1)


def srgb_to_linear(c):
    """Exact sRGB EOTF (piecewise), matching Math/Color.h gammacorrect."""
    c = jnp.asarray(c, jnp.float32)
    low = c / 12.92
    high = ((c + 0.055) / 1.055) ** 2.4
    return jnp.where(c <= 0.04045, low, high)


def linear_to_srgb(c):
    c = jnp.asarray(c, jnp.float32)
    c = jnp.maximum(c, 0.0)
    low = c * 12.92
    high = 1.055 * c ** (1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, low, high)


def rgb_to_hsv(rgb):
    """RGB → HSV with H in [0, 360). Vectorized over leading axes."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    c_min = jnp.min(rgb, axis=-1)
    delta = v - c_min
    safe = jnp.where(delta > 0, delta, 1.0)
    h_r = jnp.mod((g - b) / safe, 6.0)
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b)) * 60.0
    h = jnp.where(delta > 0, h, 0.0)
    s = jnp.where(v > 0, delta / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    i = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [c, x, z, z, x, c])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [x, c, c, x, z, z])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [z, z, x, c, c, x])
    m = v - c
    return jnp.stack([r + m, g + m, b + m], axis=-1)
