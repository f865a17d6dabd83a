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

MAX_MIP_LEVELS = 16


class TextureBank(NamedTuple):
    """All scene textures in one padded array + per-texture metadata.

    The full MIP CHAIN of every texture is packed VERTICALLY into the
    atlas canvas (level l of texture i starts at row ``mip_offsets[i, l]``
    with size ``mip_sizes[i, l]``; Σ_l h_l < 2·h so the canvas is at most
    twice the tallest level-0 image) — render-time trilinear minification
    (Texture.h:26-60 MinificationFilter::Trilinear) indexes levels with
    plain row offsets, no per-level arrays.
    """

    data: jnp.ndarray         # [n, atlas_h, max_w, 4] float32 (linear)
    sizes: jnp.ndarray        # [n, 2] int32 (h, w) of level 0
    filters: jnp.ndarray      # [n] int32 (FILTER_*)
    wraps: jnp.ndarray        # [n, 2] int32 (wrap_u, wrap_v)
    mip_offsets: jnp.ndarray  # [n, MAX_MIP_LEVELS] int32 row offset / level
    mip_sizes: jnp.ndarray    # [n, MAX_MIP_LEVELS, 2] int32 (h, w) / level
    n_levels: jnp.ndarray     # [n] int32

    @property
    def count(self) -> int:
        return int(self.data.shape[0]) if self.data.ndim == 4 else 0

    def has_trilinear(self) -> bool:
        """Host-side static hint for settings_for_scene (not for jit)."""
        return self.count > 0 and bool(
            np.any(np.asarray(self.filters) == FILTER_TRILINEAR))

    @staticmethod
    @host_build
    def build(textures) -> "TextureBank":
        """textures: list of dicts {image [h,w,c] float, filter, wrap_u, wrap_v}."""
        L = MAX_MIP_LEVELS
        if not textures:
            # Statically EMPTY (n=0): sample_texture sees the shape at trace
            # time and skips every fetch — an untextured scene pays zero
            # texture gathers per wavefront step (BASELINE.md, TPU gather
            # costs).
            return TextureBank(
                data=jnp.zeros((0, 1, 1, 4), jnp.float32),
                sizes=jnp.ones((0, 2), jnp.int32),
                filters=jnp.zeros(0, jnp.int32),
                wraps=jnp.ones((0, 2), jnp.int32),
                mip_offsets=jnp.zeros((0, L), jnp.int32),
                mip_sizes=jnp.ones((0, L, 2), jnp.int32),
                n_levels=jnp.ones(0, jnp.int32))
        n = len(textures)
        chains = []
        for t in textures:
            img = np.asarray(t["image"], np.float32)
            if img.ndim == 2:
                img = img[..., None]
            chains.append(fill_mipmaps(img)[:L])
        max_w = max(c[0].shape[1] for c in chains)
        atlas_h = max(sum(m.shape[0] for m in c) for c in chains)
        data = np.zeros((n, atlas_h, max_w, 4), np.float32)
        sizes = np.zeros((n, 2), np.int32)
        filters = np.zeros(n, np.int32)
        wraps = np.zeros((n, 2), np.int32)
        mip_offsets = np.zeros((n, L), np.int32)
        mip_sizes = np.ones((n, L, 2), np.int32)
        n_levels = np.zeros(n, np.int32)
        for i, (t, chain) in enumerate(zip(textures, chains)):
            oy = 0
            for li, m in enumerate(chain):
                h, w = m.shape[0], m.shape[1]
                c = m.shape[-1]
                data[i, oy:oy + h, :w, :c] = m
                if c < 4:
                    data[i, oy:oy + h, :w, 3] = 1.0
                mip_offsets[i, li] = oy
                mip_sizes[i, li] = (h, w)
                oy += h
            # Degenerate levels clamp to the last real one.
            for li in range(len(chain), L):
                mip_offsets[i, li] = mip_offsets[i, len(chain) - 1]
                mip_sizes[i, li] = mip_sizes[i, len(chain) - 1]
            n_levels[i] = len(chain)
            sizes[i] = (chain[0].shape[0], chain[0].shape[1])
            filters[i] = t.get("filter", FILTER_LINEAR)
            wraps[i] = (t.get("wrap_u", WRAP_REPEAT),
                        t.get("wrap_v", WRAP_REPEAT))
        return TextureBank(
            data=jnp.asarray(data), sizes=jnp.asarray(sizes),
            filters=jnp.asarray(filters), wraps=jnp.asarray(wraps),
            mip_offsets=jnp.asarray(mip_offsets),
            mip_sizes=jnp.asarray(mip_sizes),
            n_levels=jnp.asarray(n_levels))


def _wrap_coord(i, n, mode):
    clamped = jnp.clip(i, 0, n - 1)
    repeated = jnp.mod(i, jnp.maximum(n, 1))
    return jnp.where(mode == WRAP_REPEAT, repeated, clamped)


def _sample_level(bank: TextureBank, tid, fu, fv, wrap_u, wrap_v, filt,
                  level):
    """Nearest/bilinear fetch of one mip level (Texture.cpp sample2D with
    an explicit mipmap_level): coordinates scale to the level's size and
    rows shift by the level's atlas offset."""
    h = bank.mip_sizes[tid, level, 0]
    w = bank.mip_sizes[tid, level, 1]
    oy = bank.mip_offsets[tid, level]

    x = fu * w - 0.5
    y = fv * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]

    def fetch(xi, yi):
        xi = _wrap_coord(xi, w, wrap_u)
        yi = _wrap_coord(yi, h, wrap_v)
        return bank.data[tid, oy + yi, xi]

    nearest = fetch(jnp.round(x).astype(jnp.int32),
                    jnp.round(y).astype(jnp.int32))
    bilinear = ((fetch(x0, y0) * (1 - tx) + fetch(x0 + 1, y0) * tx) * (1 - ty)
                + (fetch(x0, y0 + 1) * (1 - tx)
                   + fetch(x0 + 1, y0 + 1) * tx) * ty)
    return jnp.where((filt == FILTER_NONE)[..., None], nearest, bilinear)


def sample_texture(bank: TextureBank, texture_id, uv, default=None,
                   footprint_uv=None, trilinear: bool = False):
    """Per-lane texture fetch: texture_id [...] int32 (-1 = use default),
    uv [..., 2] → rgba [..., 4].

    Nearest or bilinear per the texture's sampler state (Texture::sample2D);
    v = 0 is the bottom of the image (the reference's texcoord convention).

    Trilinear minification (Texture.h MinificationFilter::Trilinear): when
    ``trilinear`` is set (a STATIC scene hint — settings_for_scene reads
    TextureBank.has_trilinear()) and ``footprint_uv`` carries the ray
    footprint in uv units, textures whose filter is FILTER_TRILINEAR blend
    the two mip levels around lod = log2(footprint · size); others stay on
    level 0. With the hint clear the level math compiles away entirely.

    A statically empty bank (n=0, untextured scene) compiles to the default
    constant — no gathers are emitted.
    """
    if default is None:
        default = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    if bank.data.shape[0] == 0:
        shape = jnp.shape(texture_id) + (4,)
        return jnp.broadcast_to(default, shape)
    tid = jnp.maximum(texture_id, 0)
    filt = bank.filters[tid]
    wrap_u = bank.wraps[tid, 0]
    wrap_v = bank.wraps[tid, 1]

    # v flip: image row 0 is the top.
    u = uv[..., 0]
    v = 1.0 - uv[..., 1]

    # Wrap in float uv space first (Repeat), then sample.
    fu = jnp.where(wrap_u == WRAP_REPEAT, u - jnp.floor(u), jnp.clip(u, 0.0, 1.0))
    fv = jnp.where(wrap_v == WRAP_REPEAT, v - jnp.floor(v), jnp.clip(v, 0.0, 1.0))

    if trilinear and footprint_uv is not None:
        size = jnp.maximum(bank.sizes[tid, 0], bank.sizes[tid, 1]
                           ).astype(jnp.float32)
        lod = jnp.log2(jnp.maximum(footprint_uv * size, 1.0))
        lod = jnp.where(filt == FILTER_TRILINEAR, lod, 0.0)
        lod = jnp.clip(lod, 0.0, (bank.n_levels[tid] - 1).astype(jnp.float32))
        l0 = lod.astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, bank.n_levels[tid] - 1)
        tl = (lod - l0.astype(jnp.float32))[..., None]
        out = (_sample_level(bank, tid, fu, fv, wrap_u, wrap_v, filt, l0)
               * (1.0 - tl)
               + _sample_level(bank, tid, fu, fv, wrap_u, wrap_v, filt, l1)
               * tl)
    else:
        out = _sample_level(bank, tid, fu, fv, wrap_u, wrap_v, filt,
                            jnp.zeros_like(tid))
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
