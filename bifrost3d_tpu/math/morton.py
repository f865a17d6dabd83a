"""Morton (Z-order) encoding — counterpart of ``Math/MortonEncode.h``.

Used for primitive-ID visualization colors (reference
``OptiXRenderer/Utils.h:304-329``) and for LBVH construction ray/primitive
ordering in :mod:`bifrost3d_tpu.geometry.bvh`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _part_1by1(x):
    x = x.astype(jnp.uint32) & 0x0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _compact_1by1(x):
    x = x.astype(jnp.uint32) & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF
    return x


def _part_1by2(x):
    x = x.astype(jnp.uint32) & 0x000003FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_encode_2d(x, y):
    return _part_1by1(x) | (_part_1by1(y) << 1)


def morton_decode_2d(code):
    return _compact_1by1(code), _compact_1by1(code >> 1)


def morton_encode_3d(x, y, z):
    """Interleave 10-bit x/y/z into a 30-bit Morton code (LBVH key)."""
    return _part_1by2(x) | (_part_1by2(y) << 1) | (_part_1by2(z) << 2)
