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
    # Rotation matrix with columns (right, up, forward) → quaternion.
    m = jnp.stack([r, u, f], axis=-1)
    return quat_from_matrix(m)


def quat_from_matrix(m):
    """Rotation matrix [..., 3, 3] → unit quaternion (x, y, z, w).

    Branch-free Shepperd's method: all four candidate quaternions are
    computed and the numerically dominant one selected with masks (the
    naive sqrt+copysign shortcut breaks when w is not the largest
    component — e.g. any rotation by more than 90°).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    t_w = 1.0 + m00 + m11 + m22   # 4w²
    t_x = 1.0 + m00 - m11 - m22   # 4x²
    t_y = 1.0 - m00 + m11 - m22   # 4y²
    t_z = 1.0 - m00 - m11 + m22   # 4z²

    def cand(t, a, b, c, order):
        s = jnp.sqrt(jnp.maximum(t, 1e-12))
        inv = 0.5 / s
        comps = {order[0]: 0.5 * s, order[1]: a * inv, order[2]: b * inv,
                 order[3]: c * inv}
        return jnp.stack([comps["x"], comps["y"], comps["z"], comps["w"]], axis=-1)

    q_w = cand(t_w, m21 - m12, m02 - m20, m10 - m01, "wxyz")
    q_x = cand(t_x, m21 - m12, m01 + m10, m02 + m20, "xwyz")
    q_y = cand(t_y, m02 - m20, m01 + m10, m12 + m21, "ywxz")
    q_z = cand(t_z, m10 - m01, m02 + m20, m12 + m21, "zwxy")

    ts = jnp.stack([t_w, t_x, t_y, t_z], axis=-1)
    best = jnp.argmax(ts, axis=-1)[..., None]
    q = jnp.where(best == 0, q_w,
                  jnp.where(best == 1, q_x, jnp.where(best == 2, q_y, q_z)))
    return quat_normalize(q)


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
