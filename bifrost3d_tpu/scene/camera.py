"""Cameras: +Z-forward perspective/orthographic projection and ray generation.

Counterpart of the reference's ``Scene/Camera.h`` + ``CameraUtils``
(Camera.cpp:237-300, SURVEY.md §2.3): perspective projection with
hand-derived inverse, and ``ray_from_viewport_point`` generalized to whole
pixel grids — one fused op produces every camera ray of the wavefront.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bifrost3d_tpu.math.transform import (
    Transform, transform_inverse, transform_look_at, transform_point)
from bifrost3d_tpu.math.quaternion import quat_rotate
from bifrost3d_tpu.math.vec import normalize
from bifrost3d_tpu.utils.hostbuild import host_build


class PinholeCamera(NamedTuple):
    """Camera = world transform + inverse projection (for ray gen).

    ``inverse_projection`` maps NDC → view space, matching the reference's
    inverse perspective matrix (Camera.cpp:261-266).
    """

    transform: Transform
    projection: jnp.ndarray          # [4, 4]
    inverse_projection: jnp.ndarray  # [4, 4]


def perspective_projection(near, far, fov_radians, aspect):
    """+Z-forward perspective matrix + exact inverse (Camera.cpp:237-266)."""
    f = 1.0 / jnp.tan(fov_radians * 0.5)
    a = (far + near) / (near - far)
    b = (2.0 * far * near) / (near - far)
    proj = jnp.zeros((4, 4), jnp.float32)
    proj = proj.at[0, 0].set(f / aspect)
    proj = proj.at[1, 1].set(f)
    proj = proj.at[2, 2].set(-a)
    proj = proj.at[2, 3].set(b)
    proj = proj.at[3, 2].set(1.0)
    inv = jnp.zeros((4, 4), jnp.float32)
    inv = inv.at[0, 0].set(aspect / f)
    inv = inv.at[1, 1].set(1.0 / f)
    inv = inv.at[2, 3].set(1.0)
    inv = inv.at[3, 2].set(1.0 / b)
    inv = inv.at[3, 3].set(a / b)
    return proj, inv


def orthographic_projection(width, height, depth):
    """Orthographic matrix + inverse (Camera.cpp:268-287)."""
    proj = jnp.zeros((4, 4), jnp.float32)
    proj = proj.at[0, 0].set(2.0 / width)
    proj = proj.at[1, 1].set(2.0 / height)
    proj = proj.at[2, 2].set(2.0 / depth)
    proj = proj.at[2, 3].set(-1.0)
    proj = proj.at[3, 3].set(1.0)
    inv = jnp.zeros((4, 4), jnp.float32)
    inv = inv.at[0, 0].set(0.5 * width)
    inv = inv.at[1, 1].set(0.5 * height)
    inv = inv.at[2, 2].set(0.5 * depth)
    inv = inv.at[2, 3].set(0.5 * depth)
    inv = inv.at[3, 3].set(1.0)
    return proj, inv


@host_build
def perspective_camera(eye, target, fov_radians=jnp.pi / 3, aspect=1.0,
                       near=0.1, far=1000.0, up=None) -> PinholeCamera:
    proj, inv = perspective_projection(near, far, fov_radians, aspect)
    return PinholeCamera(
        transform=transform_look_at(eye, target, up),
        projection=proj, inverse_projection=inv)


def camera_ray_directions(camera: PinholeCamera, viewport_points):
    """Viewport points [..., 2] in [0,1]² → (origins [..., 3], dirs [..., 3]).

    The generalized ``ray_from_viewport_point`` (Camera.cpp:289-300):
    unproject near- and far-plane NDC points through the inverse projection,
    then rotate into world space.
    """
    ndc_xy = viewport_points * 2.0 - 1.0
    near4 = jnp.concatenate(
        [ndc_xy, jnp.full(ndc_xy.shape[:-1] + (1,), -1.0),
         jnp.ones(ndc_xy.shape[:-1] + (1,))], axis=-1)
    inv = camera.inverse_projection
    # HIGHEST precision: the clip-space w reconstruction cancels
    # inv[3,2]·ndc_z against inv[3,3] (magnitudes ~far/near); TPU default
    # matmul precision (bf16 passes) flips its sign for small near planes,
    # negating every ray direction.
    scaled_near = jnp.einsum('...j,ij->...i', near4, inv,
                             precision=jax.lax.Precision.HIGHEST)
    ray_near = scaled_near[..., :3] / scaled_near[..., 3:4]
    scaled_far = scaled_near + 2.0 * inv[:, 2]
    ray_far = scaled_far[..., :3] / scaled_far[..., 3:4]
    dir_view = normalize(ray_far - ray_near)
    t = camera.transform
    origin = t.translation + quat_rotate(t.rotation, ray_near * t.scale)
    direction = quat_rotate(t.rotation, dir_view)
    return origin, direction


def project_to_screen(camera: PinholeCamera, point):
    """World point [..., 3] → (uv [..., 2] in [0,1]², w [...]).

    The exact inverse of :func:`camera_ray_directions` (``w`` > 0 means in
    front of the camera — the clip-space w, positive along the +Z view
    axis). Differentiable in ``point``: the edge-sampled geometry-gradient
    estimator (diff/mesh_edge_grad.py) takes its screen-space edge
    velocities through this function with jax.jacfwd.
    """
    view = transform_point(transform_inverse(camera.transform), point)
    v4 = jnp.concatenate([view, jnp.ones(view.shape[:-1] + (1,))], axis=-1)
    clip = jnp.einsum('...j,ij->...i', v4, camera.projection,
                      precision=jax.lax.Precision.HIGHEST)
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :2] / safe_w[..., None]
    return (ndc + 1.0) * 0.5, w


def camera_rays(camera: PinholeCamera, width: int, height: int, jitter=None):
    """One ray per pixel. ``jitter`` [h, w, 2] in [0,1)² (default centers).

    Row 0 is the TOP of the image (viewport v = 1), matching the reference's
    image convention.
    """
    x = (jnp.arange(width, dtype=jnp.float32))[None, :, None]
    y = (jnp.arange(height, dtype=jnp.float32))[:, None, None]
    if jitter is None:
        jitter = jnp.full((height, width, 2), 0.5, jnp.float32)
    u = (x + jitter[..., 0:1]) / width
    v = 1.0 - (y + jitter[..., 1:2]) / height
    return camera_ray_directions(camera, jnp.concatenate([u, v], axis=-1))
