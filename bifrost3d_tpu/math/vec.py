"""Vector math over broadcastable jnp arrays.

Counterpart of the reference's ``Math/Vector.h`` (SURVEY.md §2.2), redesigned
for TPU: a "Vector3" here is any array whose last axis has size 3, and every
helper broadcasts over leading axes so the same code path serves a single ray
and a million-ray wavefront. All functions are jit/vmap/grad-safe (no Python
branching on values, NaN-free where guarded).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gsafe(x, floor):
    """max with a gradient-safe floor: sqrt'(0) = inf would poison masked
    lanes in backward passes, so never let the operand reach exactly 0."""
    return jnp.maximum(x, jnp.maximum(floor, 1e-12))


def _gclip(x, lo, hi):
    return jnp.clip(x, jnp.maximum(lo, 1e-12), hi)



def vec3(x, y, z, dtype=jnp.float32):
    """Stack three broadcastable components into a trailing axis of size 3."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def dot(a, b, keepdims: bool = False):
    """Inner product along the trailing axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v, keepdims: bool = False):
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def length(v, keepdims: bool = False):
    return jnp.sqrt(length_squared(v, keepdims))


def distance(a, b):
    return length(a - b)


def safe_rsqrt(x, eps=1e-20):
    """Reciprocal square root that never divides by zero (autodiff-safe)."""
    return jnp.where(x > eps, 1.0, 0.0) / jnp.sqrt(_gsafe(x, eps))


def normalize(v, eps=1e-20):
    """Unit vector; returns 0 for (near-)zero input instead of NaN.

    The zero-guard keeps gradients finite through degenerate samples, which
    the reference handles with NaN-encoded invalid PDFs instead
    (OptiXRenderer/Types.h:152-204) — NaN encoding is hostile to autodiff.
    """
    return v * safe_rsqrt(length_squared(v, keepdims=True), eps)


def lerp(a, b, t):
    return a + (b - a) * t


def reflect(direction, normal):
    """Mirror ``direction`` (pointing toward the surface) about ``normal``."""
    return direction - 2.0 * dot(direction, normal, keepdims=True) * normal


def refract(direction, normal, eta):
    """Refract ``direction`` (toward the surface, unit) through ``normal``.

    ``eta = n_incident / n_transmitted``. Returns (refracted_dir, tir_mask);
    on total internal reflection the direction is the reflection instead, so
    callers can select without producing NaNs. Mirrors the glass path of the
    reference's SmallPT (apps/SmallPT/smallpt.h:90-117) in branch-free form.
    """
    cos_i = -dot(direction, normal, keepdims=True)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(_gsafe(1.0 - sin2_t, 0.0))
    refracted = eta * direction + (eta * cos_i - cos_t) * normal
    reflected = reflect(direction, normal)
    return jnp.where(tir, reflected, refracted), tir[..., 0]


def orthonormal_basis(normal):
    """Build a right-handed tangent basis (tangent, bitangent) from a normal.

    Branch-free Duff et al. 2017 construction, matching the reference's
    device tangent basis (OptiXRenderer/Utils.h, SURVEY.md §2.4) but
    vectorized over the wavefront.
    """
    n = normal
    sign = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    tangent = jnp.concatenate(
        [1.0 + sign * n[..., 0:1] ** 2 * a, sign * b, -sign * n[..., 0:1]], axis=-1)
    bitangent = jnp.concatenate(
        [b, sign + n[..., 1:2] ** 2 * a, -n[..., 1:2]], axis=-1)
    return tangent, bitangent


def to_local(v, normal):
    """World → tangent space (z = normal). Counterpart of the reference TBN."""
    t, b = orthonormal_basis(normal)
    return jnp.stack([dot(v, t), dot(v, b), dot(v, normal)], axis=-1)


def to_world(v, normal):
    """Tangent space (z = normal) → world."""
    t, b = orthonormal_basis(normal)
    return (v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * normal)
