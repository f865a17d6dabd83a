"""Textures: image pixel formats, mipmaps, samplers, and the TextureBank.

Counterpart of the reference's ``Assets/Image.h`` + ``Assets/Texture.h``
(SURVEY.md §2.3): pixel formats (byte formats ↔ float), sRGB flagging,
mipmap chains, summed-area tables, and sampler state (mag/min filter
None/Linear/Trilinear, wrap Clamp/Repeat).

TPU design: all textures of a scene live in ONE padded atlas array
[n, max_h, max_w, 4] (the :class:`TextureBank`) so per-lane texture fetch
is a single gather indexed by (texture id, y, x) — the analogue of the
reference's bindless texture table on the GPU.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp
from bifrost3d_tpu.utils.hostbuild import host_build

# Filter modes (Assets/Texture.h sampler state).
FILTER_NONE = 0
FILTER_LINEAR = 1
FILTER_TRILINEAR = 2

WRAP_CLAMP = 0
WRAP_REPEAT = 1


# ---------------------------------------------------------------------------
# Image utilities (Assets/Image.h)
# ---------------------------------------------------------------------------

def fill_mipmaps(image: np.ndarray) -> List[np.ndarray]:
    """Full mip chain by 2x2 box down-filtering (Image::fill_mipmaps)."""
    mips = [np.asarray(image, np.float32)]
    while min(mips[-1].shape[0], mips[-1].shape[1]) > 1:
        prev = mips[-1]
        h2, w2 = max(prev.shape[0] // 2, 1), max(prev.shape[1] // 2, 1)
        ph, pw = h2 * 2, w2 * 2
        p = prev[:ph, :pw]
        mips.append(0.25 * (p[0::2, 0::2] + p[1::2, 0::2]
                            + p[0::2, 1::2] + p[1::2, 1::2]))
    return mips


def summed_area_table(image: np.ndarray) -> np.ndarray:
    """Inclusive 2D prefix sum (Image summed-area table)."""
    return np.cumsum(np.cumsum(np.asarray(image, np.float64), axis=0), axis=1)


def sat_region_average(sat: np.ndarray, x0: int, y0: int, x1: int, y1: int):
    """Mean over the inclusive pixel region [x0, x1] × [y0, y1]."""
    total = sat[y1, x1].copy()
    if x0 > 0:
        total -= sat[y1, x0 - 1]
    if y0 > 0:
        total -= sat[y0 - 1, x1]
    if x0 > 0 and y0 > 0:
        total += sat[y0 - 1, x0 - 1]
    return total / ((x1 - x0 + 1) * (y1 - y0 + 1))


# ---------------------------------------------------------------------------
# Texture bank
# ---------------------------------------------------------------------------

class TextureBank(NamedTuple):
    """All scene textures in one padded array + per-texture metadata."""

    data: jnp.ndarray      # [n, max_h, max_w, 4] float32 (linear)
    sizes: jnp.ndarray     # [n, 2] int32 (h, w)
    filters: jnp.ndarray   # [n] int32 (FILTER_*)
    wraps: jnp.ndarray     # [n, 2] int32 (wrap_u, wrap_v)

    @property
    def count(self) -> int:
        return int(self.data.shape[0]) if self.data.ndim == 4 else 0

    @staticmethod
    @host_build
    def build(textures) -> "TextureBank":
        """textures: list of dicts {image [h,w,c] float, filter, wrap_u, wrap_v}."""
        if not textures:
            # Statically EMPTY (n=0): sample_texture sees the shape at trace
            # time and skips every fetch — an untextured scene pays zero
            # texture gathers per wavefront step (BASELINE.md, TPU gather
            # costs).
            return TextureBank(
                data=jnp.zeros((0, 1, 1, 4), jnp.float32),
                sizes=jnp.ones((0, 2), jnp.int32),
                filters=jnp.zeros(0, jnp.int32),
                wraps=jnp.ones((0, 2), jnp.int32))
        max_h = max(int(np.asarray(t["image"]).shape[0]) for t in textures)
        max_w = max(int(np.asarray(t["image"]).shape[1]) for t in textures)
        n = len(textures)
        data = np.zeros((n, max_h, max_w, 4), np.float32)
        sizes = np.zeros((n, 2), np.int32)
        filters = np.zeros(n, np.int32)
        wraps = np.zeros((n, 2), np.int32)
        for i, t in enumerate(textures):
            img = np.asarray(t["image"], np.float32)
            if img.ndim == 2:
                img = img[..., None]
            c = img.shape[-1]
            h, w = img.shape[0], img.shape[1]
            data[i, :h, :w, :c] = img
            if c < 4:
                data[i, :h, :w, 3] = 1.0 if c < 4 else data[i, :h, :w, 3]
            sizes[i] = (h, w)
            filters[i] = t.get("filter", FILTER_LINEAR)
            wraps[i] = (t.get("wrap_u", WRAP_REPEAT), t.get("wrap_v", WRAP_REPEAT))
        return TextureBank(
            data=jnp.asarray(data), sizes=jnp.asarray(sizes),
            filters=jnp.asarray(filters), wraps=jnp.asarray(wraps))


def _wrap_coord(i, n, mode):
    clamped = jnp.clip(i, 0, n - 1)
    repeated = jnp.mod(i, jnp.maximum(n, 1))
    return jnp.where(mode == WRAP_REPEAT, repeated, clamped)


def sample_texture(bank: TextureBank, texture_id, uv, default=None):
    """Per-lane texture fetch: texture_id [...] int32 (-1 = use default),
    uv [..., 2] → rgba [..., 4].

    Nearest or bilinear per the texture's sampler state (Texture::sample2D);
    v = 0 is the bottom of the image (the reference's texcoord convention).

    A statically empty bank (n=0, untextured scene) compiles to the default
    constant — no gathers are emitted.
    """
    if default is None:
        default = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    if bank.data.shape[0] == 0:
        shape = jnp.shape(texture_id) + (4,)
        return jnp.broadcast_to(default, shape)
    tid = jnp.maximum(texture_id, 0)
    h = bank.sizes[tid, 0]
    w = bank.sizes[tid, 1]
    filt = bank.filters[tid]
    wrap_u = bank.wraps[tid, 0]
    wrap_v = bank.wraps[tid, 1]

    # v flip: image row 0 is the top.
    u = uv[..., 0]
    v = 1.0 - uv[..., 1]

    # Wrap in float uv space first (Repeat), then sample.
    fu = jnp.where(wrap_u == WRAP_REPEAT, u - jnp.floor(u), jnp.clip(u, 0.0, 1.0))
    fv = jnp.where(wrap_v == WRAP_REPEAT, v - jnp.floor(v), jnp.clip(v, 0.0, 1.0))

    x = fu * w - 0.5
    y = fv * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]

    def fetch(xi, yi):
        xi = _wrap_coord(xi, w, wrap_u)
        yi = _wrap_coord(yi, h, wrap_v)
        return bank.data[tid, yi, xi]

    nearest = fetch(jnp.round(x).astype(jnp.int32), jnp.round(y).astype(jnp.int32))
    bilinear = ((fetch(x0, y0) * (1 - tx) + fetch(x0 + 1, y0) * tx) * (1 - ty)
                + (fetch(x0, y0 + 1) * (1 - tx) + fetch(x0 + 1, y0 + 1) * tx) * ty)
    out = jnp.where((filt == FILTER_NONE)[..., None], nearest, bilinear)
    return jnp.where((texture_id < 0)[..., None], default, out)


# ---------------------------------------------------------------------------
# Byte-format conversions (Math/FixedPointTypes.h UNorm8/UNorm16)
# ---------------------------------------------------------------------------

def unorm8_encode(x):
    return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def unorm8_decode(b):
    return b.astype(jnp.float32) / 255.0


def unorm16_encode(x):
    return (jnp.clip(x, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint16)


def unorm16_decode(b):
    return b.astype(jnp.float32) / 65535.0
