"""Edge-sampled (boundary) geometry gradients for analytic sphere scenes.

The pathwise gradient of a path-traced image w.r.t. object POSITION misses
the visibility boundary term entirely: radiance is piecewise constant
across a silhouette, so `d/dθ ∫ L` has a contour-integral contribution
`∮ (L_in − L_out)(v·n̂) dl` along each silhouette (Li et al. 2018, "Differentiable
Monte Carlo Ray Tracing through Edge Sampling"). The reference renderer has no
differentiable anything (SURVEY.md §7.2 step 7 marks this as new TPU-side
work); this module adds the first slice: silhouette edge sampling for the
SmallPT sphere scene.

Approach (all pure jnp, vmapped over edge samples — TPU-friendly):
- A sphere's silhouette as seen from the pinhole is a circle on the view
  sphere: directions ω(φ) on the cone around ŵ = (c − o)/|c − o| with
  half-angle α = asin(r/|c − o|). ω(φ, c) is DIFFERENTIABLE in the sphere
  center c — jax.jacfwd gives the exact edge velocity.
- Project ω to continuous image coordinates q(φ, c) ∈ [0,1]² by solving
  the 3×3 linear system s·ω = cam_d + a·cx + b·cy (the inverse of
  ``smallpt_camera_ray``).
- The mean-image loss is the area integral of radiance over the image
  square, so
      d(mean)/dc = ∮ ΔL̄(φ) · det[∂q/∂φ, ∂q/∂c] dφ
  where ΔL̄ is the channel-mean radiance jump across the edge, estimated
  by tracing rays just inside/outside the cone (occluded silhouette arcs
  cancel automatically because both rays then see the occluder).
- Total gradient = pathwise autodiff (interior, NaN-hygienic since the
  double-where fixes in scene/spheres.py) + this boundary term.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.integrator.smallpt import (
    SMALLPT_CAM_DIRECTION,
    SMALLPT_CAM_ORIGIN,
    smallpt_camera_ray,
)
from bifrost3d_tpu.math.vec import cross, normalize
from bifrost3d_tpu.scene.spheres import SphereScene, intersect_spheres


def _camera_frame(width: int, height: int):
    cam_o = jnp.asarray(SMALLPT_CAM_ORIGIN, jnp.float32)
    cam_d = normalize(jnp.asarray(SMALLPT_CAM_DIRECTION, jnp.float32))
    cx = jnp.asarray([width * 0.5135 / height, 0.0, 0.0], jnp.float32)
    cy = normalize(cross(cx, cam_d)) * 0.5135
    return cam_o, cam_d, cx, cy


def silhouette_direction(center, radius, cam_o, phi, delta_angle=0.0):
    """Unit direction from the pinhole to the silhouette point at angle
    ``phi``, with the cone half-angle offset by ``delta_angle`` (negative
    = just inside the sphere, positive = just outside). Differentiable in
    ``center``."""
    w = center - cam_o
    dist = jnp.sqrt(jnp.sum(w * w))
    w_hat = w / dist
    sin_a = jnp.clip(radius / dist, 0.0, 1.0 - 1e-7)
    alpha = jnp.arcsin(sin_a) + delta_angle
    # Fixed-convention tangent basis (differentiable in w_hat).
    up = jnp.where(jnp.abs(w_hat[0]) > 0.9,
                   jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                   jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    e1 = normalize(cross(up, w_hat))
    e2 = cross(w_hat, e1)
    return (jnp.cos(alpha) * w_hat
            + jnp.sin(alpha) * (jnp.cos(phi) * e1 + jnp.sin(phi) * e2))


def screen_coords(omega, width: int, height: int):
    """Image coordinates (u, v) ∈ [0,1]² of the ray through direction
    ``omega`` — the inverse of ``smallpt_camera_ray``. Also returns the
    ray-scale s (s <= 0 means behind the camera)."""
    cam_o, cam_d, cx, cy = _camera_frame(width, height)
    # Solve a·cx + b·cy − s·ω = −cam_d.
    A = jnp.stack([cx, cy, -omega], axis=-1)    # [3, 3]
    abs_ = jnp.linalg.solve(A, -cam_d)
    a, b, s = abs_[0], abs_[1], abs_[2]
    return jnp.stack([a + 0.5, b + 0.5]), s


def first_hit_emission(scene: SphereScene, origin, direction):
    """Channel-mean emission of the first hit (the purely boundary-driven
    radiance used by the validation tests)."""
    t, idx, hit = intersect_spheres(scene, origin, direction)
    e = jnp.mean(scene.emission[jnp.maximum(idx, 0)], axis=-1)
    return jnp.where(hit, e, 0.0)


def direct_emission_image(scene: SphereScene, width: int, height: int,
                          samples_per_pixel: int = 4):
    """Deterministic mean of first-hit emission over the image square,
    using a stratified sub-pixel grid (the forward function the FD side of
    the edge-gradient tests differentiates). → scalar mean."""
    n = samples_per_pixel
    u = (jnp.arange(width * n, dtype=jnp.float32) + 0.5) / (width * n)
    v = (jnp.arange(height * n, dtype=jnp.float32) + 0.5) / (height * n)
    uu, vv = jnp.meshgrid(u, v)
    o, d = smallpt_camera_ray(uu.reshape(-1), vv.reshape(-1), width, height)
    return jnp.mean(first_hit_emission(scene, o, d))


@partial(jax.jit, static_argnames=("width", "height", "n_samples",
                                   "radiance_fn"))
def edge_position_gradient(scene: SphereScene, sphere_index,
                           width: int, height: int,
                           n_samples: int = 512,
                           edge_eps: float = 1e-3,
                           radiance_fn=first_hit_emission):
    """Boundary term of d(mean channel-mean image)/d(center of sphere i).

    Returns [3]. ``radiance_fn(scene, origin, direction) -> [...]``
    evaluates the (channel-mean) radiance along probe rays; the default
    covers emission-only renders, pass a full-estimator closure for path
    traced images (primary-silhouette term only — secondary silhouettes
    are future work).
    """
    cam_o, _, _, _ = _camera_frame(width, height)
    center = scene.position[sphere_index]
    radius = scene.radius[sphere_index]

    phis = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) \
        * (2.0 * jnp.pi / n_samples)

    def q_of(phi, c):
        omega = silhouette_direction(c, radius, cam_o, phi)
        q, s = screen_coords(omega, width, height)
        return q, s

    def per_sample(phi):
        # Edge velocity and tangent via exact forward-mode jacobians.
        (q, s), (dq_dphi, _) = jax.jvp(
            lambda p: q_of(p, center), (phi,), (jnp.float32(1.0),))
        dq_dc = jax.jacfwd(lambda c: q_of(phi, c)[0])(center)  # [2, 3]

        # Radiance just inside / outside the silhouette. Probe origins
        # follow the camera convention (origin = pinhole + 140·d, i.e.
        # 140·s·ω — smallpt.h starts rays INSIDE the box, past the front
        # wall sphere).
        probe_o = cam_o + 140.0 * s * \
            silhouette_direction(center, radius, cam_o, phi)
        w_in = silhouette_direction(center, radius, cam_o, phi, -edge_eps)
        w_out = silhouette_direction(center, radius, cam_o, phi, +edge_eps)
        L_in = radiance_fn(scene, probe_o, w_in)
        L_out = radiance_fn(scene, probe_o, w_out)

        inside_image = (s > 0.0) & jnp.all((q >= 0.0) & (q <= 1.0))
        # det[∂q/∂φ, ∂q/∂c_j] = signed image-area swept per unit c_j.
        det = dq_dphi[0] * dq_dc[1] - dq_dphi[1] * dq_dc[0]   # [3]
        return jnp.where(inside_image, (L_in - L_out) * det, 0.0)

    contributions = jax.vmap(per_sample)(phis)        # [n, 3]
    # Mean over φ × the 2π measure of the parameterization.
    return jnp.mean(contributions, axis=0) * (2.0 * jnp.pi)


def smallpt_position_gradient(scene: SphereScene, sphere_index,
                              width: int, height: int,
                              forward_fn, n_samples: int = 512,
                              radiance_fn=first_hit_emission):
    """Pathwise (autodiff of ``forward_fn``) + primary-silhouette boundary
    gradient of a scalar image functional w.r.t. one sphere's center.

    ``forward_fn(scene) -> scalar`` must be the mean over the image square
    of the same radiance ``radiance_fn`` probes along edge rays.
    """
    pathwise = jax.grad(
        lambda c: forward_fn(scene._replace(
            position=scene.position.at[sphere_index].set(c))))(
        scene.position[sphere_index])
    boundary = edge_position_gradient(
        scene, sphere_index, width, height, n_samples=n_samples,
        radiance_fn=radiance_fn)
    return pathwise + boundary
