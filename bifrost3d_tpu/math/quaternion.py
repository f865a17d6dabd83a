"""Quaternion rotations — counterpart of the reference's ``Math/Quaternion.h``.

Quaternions are arrays ``[..., 4]`` laid out as ``(x, y, z, w)`` (vector part
first, scalar last), unit-length for rotations. Everything broadcasts over
leading axes and is jit/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from bifrost3d_tpu.math.vec import cross, dot, normalize


def quat_identity(dtype=jnp.float32):
    return jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_from_axis_angle(axis, angle):
    """Rotation of ``angle`` radians about unit ``axis``."""
    angle = jnp.asarray(angle, jnp.float32)
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    return jnp.concatenate(
        [jnp.asarray(axis) * s, jnp.cos(half)[..., None]], axis=-1)


def quat_conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a, b):
    """Hamilton product a*b (apply b first, then a)."""
    av, aw = a[..., :3], a[..., 3:4]
    bv, bw = b[..., :3], b[..., 3:4]
    v = aw * bv + bw * av + cross(av, bv)
    w = aw * bw - dot(av, bv, keepdims=True)
    return jnp.concatenate([v, w], axis=-1)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (q v q*)."""
    qv, qw = q[..., :3], q[..., 3:4]
    t = 2.0 * cross(qv, v)
    return v + qw * t + cross(qv, t)


def quat_look_in(direction, up=None):
    """Quaternion rotating +Z onto ``direction`` with +Y near ``up``.

    The reference's camera convention is +Z forward
    (Scene/Camera.cpp:237-266, SURVEY.md §2.3) — we keep that convention so
    projection matrices and golden images are directly comparable.
    """
    if up is None:
        up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    f = normalize(jnp.asarray(direction, jnp.float32))
    r = normalize(cross(up, f))
    u = cross(f, r)
    # Build rotation matrix with columns (right, up, forward), convert to quat.
    m00, m01, m02 = r[..., 0], u[..., 0], f[..., 0]
    m10, m11, m12 = r[..., 1], u[..., 1], f[..., 1]
    m20, m21, m22 = r[..., 2], u[..., 2], f[..., 2]
    trace = m00 + m11 + m22
    # Branch-free Shepperd's method via jnp.where over the four cases.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + trace)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return quat_normalize(jnp.stack([qx, qy, qz, qw], axis=-1))


def quat_to_matrix(q):
    """Unit quaternion → 3x3 rotation matrix (last two axes)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)
    return m
