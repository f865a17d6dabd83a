"""Octahedral unit-vector encoding — counterpart of ``Math/OctahedralNormal.h``.

Encodes unit vectors as two int16s (the reference's vertex-normal
compression, decoded on device at ``OptiXRenderer/Types.h:58-70``). On TPU
the decode runs inside the attribute-interpolation stage of the wavefront.
"""

from __future__ import annotations

import jax.numpy as jnp

_RANGE = 32767.0


def _sign_not_zero(v):
    return jnp.where(v >= 0.0, 1.0, -1.0)


def octahedral_encode(n):
    """Unit vectors [..., 3] → int16 [..., 2]."""
    n = jnp.asarray(n, jnp.float32)
    l1 = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    p = n[..., :2] / l1
    # Fold the lower hemisphere.
    folded = (1.0 - jnp.abs(p[..., ::-1])) * _sign_not_zero(p)
    enc = jnp.where(n[..., 2:3] <= 0.0, folded, p)
    return jnp.round(jnp.clip(enc, -1.0, 1.0) * _RANGE).astype(jnp.int16)


def octahedral_decode(e):
    """int16 [..., 2] → unit vectors [..., 3]."""
    p = e.astype(jnp.float32) / _RANGE
    z = 1.0 - jnp.sum(jnp.abs(p), axis=-1, keepdims=True)
    xy = jnp.where(z < 0.0, (1.0 - jnp.abs(p[..., ::-1])) * _sign_not_zero(p), p)
    v = jnp.concatenate([xy, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
