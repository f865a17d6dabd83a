"""Analytic sphere scenes (SmallPT) as struct-of-arrays pytrees.

Counterpart of the reference's ``apps/SmallPT/smallpt.h:47-63`` (SURVEY.md
§2.7): the classic 9-sphere Cornell box with diffuse/mirror/glass materials.
The scene is a pytree of arrays so the whole thing lives HBM-resident and
broadcasts against the ray wavefront; intersection is one fused
rays × spheres test, no BVH needed at this scale.

float32 note: the reference intersects in double. The 1e5-radius wall
spheres are catastrophically cancellation-prone in float32
(b² - |op|² + r² mixes ~1e10 magnitudes), so we use the stable
perpendicular-distance factorization det = (r - d⊥)(r + d⊥) with
d⊥ = |op - b·d|, which keeps hit-distance error small enough for an
epsilon of 1e-2 scene units.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BSDF_DIFFUSE = 0
BSDF_SPECULAR = 1
BSDF_GLASS = 2


class SphereScene(NamedTuple):
    position: jnp.ndarray   # [n, 3]
    radius: jnp.ndarray     # [n]
    emission: jnp.ndarray   # [n, 3]
    color: jnp.ndarray      # [n, 3]
    bsdf: jnp.ndarray       # [n] int32: 0 diffuse, 1 mirror, 2 glass
    # Homogeneous scattering medium per sphere (smallvpt): extinction sigma_t,
    # single-scattering albedo, HG asymmetry g. sigma_t == 0 -> no medium.
    medium_sigma_t: jnp.ndarray  # [n]
    medium_albedo: jnp.ndarray   # [n]
    medium_g: jnp.ndarray        # [n]


def _build(rows) -> SphereScene:
    pos = np.asarray([r[1] for r in rows], np.float32)
    rad = np.asarray([r[0] for r in rows], np.float32)
    emi = np.asarray([r[2] for r in rows], np.float32)
    col = np.asarray([r[3] for r in rows], np.float32)
    bsdf = np.asarray([r[4] for r in rows], np.int32)
    med = np.asarray([r[5] if len(r) > 5 else (0.0, 0.0, 0.0) for r in rows], np.float32)
    return SphereScene(
        position=jnp.asarray(pos), radius=jnp.asarray(rad),
        emission=jnp.asarray(emi), color=jnp.asarray(col),
        bsdf=jnp.asarray(bsdf),
        medium_sigma_t=jnp.asarray(med[:, 0]),
        medium_albedo=jnp.asarray(med[:, 1]),
        medium_g=jnp.asarray(med[:, 2]))


def smallpt_scene() -> SphereScene:
    """The classic smallpt Cornell box (smallpt.h:47-57): six wall spheres,
    a mirror ball, a glass ball, and a spherical ceiling light."""
    k = 1e5
    rows = [
        (k, (k + 1, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), BSDF_DIFFUSE),   # left
        (k, (-k + 99, 40.8, 81.6), (0, 0, 0), (0.25, 0.25, 0.75), BSDF_DIFFUSE),  # right
        (k, (50, 40.8, k), (0, 0, 0), (0.75, 0.75, 0.75), BSDF_DIFFUSE),          # back
        (k, (50, 40.8, -k + 170), (0, 0, 0), (0, 0, 0), BSDF_DIFFUSE),            # front
        (k, (50, k, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), BSDF_DIFFUSE),          # bottom
        (k, (50, -k + 81.6, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), BSDF_DIFFUSE),  # top
        (16.5, (27, 16.5, 47), (0, 0, 0), (0.999, 0.999, 0.999), BSDF_SPECULAR),  # mirror
        (16.5, (73, 16.5, 78), (0, 0, 0), (0.999, 0.999, 0.999), BSDF_GLASS),     # glass
        (600.0, (50, 681.6 - 0.27, 81.6), (12, 12, 12), (0, 0, 0), BSDF_DIFFUSE),  # light
    ]
    return _build(rows)


def smallvpt_scene(sigma_t=0.01, albedo=0.75, g=-0.5) -> SphereScene:
    """smallpt + a homogeneous scattering medium sphere (smallvpt.h:59-60)."""
    scene = smallpt_scene()
    rows_med = [(16.5, (27, 16.5, 47))]
    # Replace the mirror ball with a participating-medium sphere.
    return scene._replace(
        bsdf=scene.bsdf.at[6].set(BSDF_DIFFUSE),
        color=scene.color.at[6].set(jnp.zeros(3)),
        medium_sigma_t=scene.medium_sigma_t.at[6].set(sigma_t),
        medium_albedo=scene.medium_albedo.at[6].set(albedo),
        medium_g=scene.medium_g.at[6].set(g))


def intersect_spheres(scene: SphereScene, origin, direction, eps=1e-2):
    """Nearest-hit of rays [..., 3] against all spheres.

    Returns (t [...], hit_index [...] int32, hit_mask [...]). Misses get
    t = inf, index -1. Uses the cancellation-stable perpendicular-distance
    form (see module docstring); matches the double-precision reference
    root selection t = b - sqrt(det), falling back to b + sqrt(det).
    """
    op = scene.position - origin[..., None, :]        # [..., n, 3]
    b = jnp.sum(op * direction[..., None, :], axis=-1)  # [..., n]
    # Stable determinant: d_perp = |op - b*d|, det = (r - d_perp)(r + d_perp).
    perp = op - b[..., None] * direction[..., None, :]
    # Double-where sqrt hygiene: sqrt'(0) = inf would multiply the zero
    # cotangent of masked lanes into NaN when differentiating w.r.t.
    # sphere positions (geometry gradients, SURVEY §7.2 step 7).
    perp2 = jnp.sum(perp * perp, axis=-1)
    perp_ok = perp2 > 1e-12
    d_perp = jnp.where(
        perp_ok, jnp.sqrt(jnp.where(perp_ok, perp2, 1.0)), 0.0)
    det = (scene.radius - d_perp) * (scene.radius + d_perp)
    det_ok = det > 0.0
    sqrt_det = jnp.where(
        det_ok, jnp.sqrt(jnp.where(det_ok, det, 1.0)), 0.0)
    t_near = b - sqrt_det
    t_far = b + sqrt_det
    t = jnp.where(t_near > eps, t_near, jnp.where(t_far > eps, t_far, jnp.inf))
    t = jnp.where(det >= 0.0, t, jnp.inf)
    t_min = jnp.min(t, axis=-1)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    hit = jnp.isfinite(t_min)
    return t_min, jnp.where(hit, idx, -1), hit
