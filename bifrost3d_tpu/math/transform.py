"""TRS transforms — counterpart of the reference's ``Math/Transform.h``.

A :class:`Transform` is a pytree of (translation, rotation quaternion,
uniform scale), the same representation as the reference (SURVEY.md §2.2).
Registered as a pytree so transforms flow through jit/vmap/grad and can be
optimized directly by the inverse renderer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bifrost3d_tpu.math.quaternion import (
    quat_conjugate,
    quat_identity,
    quat_look_in,
    quat_mul,
    quat_rotate,
)


class Transform(NamedTuple):
    """translation [...,3], rotation quaternion [...,4] (x,y,z,w), scale [...]."""

    translation: jnp.ndarray
    rotation: jnp.ndarray
    scale: jnp.ndarray


def transform_identity():
    return Transform(
        translation=jnp.zeros(3, jnp.float32),
        rotation=quat_identity(),
        scale=jnp.asarray(1.0, jnp.float32),
    )


def transform_point(t: Transform, p):
    return t.translation + quat_rotate(t.rotation, p * t.scale[..., None])


def transform_vector(t: Transform, v):
    """Rotate+scale a direction (no translation)."""
    return quat_rotate(t.rotation, v * t.scale[..., None])


def transform_compose(outer: Transform, inner: Transform) -> Transform:
    """outer ∘ inner: apply ``inner`` first. Matches Transform::operator* semantics."""
    return Transform(
        translation=transform_point(outer, inner.translation),
        rotation=quat_mul(outer.rotation, inner.rotation),
        scale=outer.scale * inner.scale,
    )


def transform_inverse(t: Transform) -> Transform:
    inv_scale = 1.0 / t.scale
    inv_rot = quat_conjugate(t.rotation)
    inv_trans = quat_rotate(inv_rot, -t.translation) * inv_scale[..., None]
    return Transform(inv_trans, inv_rot, inv_scale)


def transform_delta(from_t: Transform, to_t: Transform) -> Transform:
    """Delta D with D ∘ from == to."""
    return transform_compose(to_t, transform_inverse(from_t))


def transform_look_at(eye, target, up=None) -> Transform:
    """Camera-style transform at ``eye`` facing ``target`` (+Z forward)."""
    eye = jnp.asarray(eye, jnp.float32)
    direction = jnp.asarray(target, jnp.float32) - eye
    return Transform(
        translation=eye,
        rotation=quat_look_in(direction, up),
        scale=jnp.asarray(1.0, jnp.float32),
    )
