"""Sphere / spot / directional light sampling, evaluation, and PDFs.

Behavioral counterparts of ``SphereLightImpl.h`` / ``SpotLightImpl.h`` /
``DirectionalLightImpl.h`` (SURVEY.md §2.4): sphere lights sample the
subtended cone with a point-light fallback; spot lights are disk lights
with cone falloff that sample whichever of (cone, disk) is tighter;
directional lights are deltas. All functions broadcast over the wavefront
and dispatch on the light ``kind`` tag with masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from bifrost3d_tpu.lights.types import (
    LIGHT_DIRECTIONAL,
    LIGHT_SPHERE,
    LIGHT_SPOT,
    LightArray,
    LightSample,
)
from bifrost3d_tpu.math.vec import dot, length, normalize, to_world
from bifrost3d_tpu.sampling.distributions import (

    PI,
    TWO_PI,
    concentric_disk_sample,
    cone_pdf,
    cone_sample,
)


def _gsafe(x, floor):
    """max with a gradient-safe floor: sqrt'(0) = inf would poison masked
    lanes in backward passes, so never let the operand reach exactly 0."""
    return jnp.maximum(x, jnp.maximum(floor, 1e-12))


def _gclip(x, lo, hi):
    return jnp.clip(x, jnp.maximum(lo, 1e-12), hi)

# Subtended-angle threshold below which a sphere light degrades to a point
# light (SphereLightImpl.h sphere_light_small_sin_theta_squared).
_SMALL_SIN2 = 0.0
_MIN_SPOT_CONE = 1e-5


# ---------------------------------------------------------------------------
# Sphere light
# ---------------------------------------------------------------------------

def _ray_sphere_t(origin, direction, center, radius):
    """Nearest positive intersection distance (−1 when missing)."""
    op = center - origin
    b = dot(op, direction)
    det = radius * radius - (dot(op, op) - b * b)
    sqrt_det = jnp.sqrt(_gsafe(det, 0.0))
    t = jnp.where(b - sqrt_det > 0, b - sqrt_det, b + sqrt_det)
    return jnp.where((det >= 0) & (t > 0), t, -1.0)


def sphere_light_sample(position, radius, power, lit_position, u2) -> LightSample:
    """Cone sampling of the subtended solid angle (SphereLightImpl.h:40-80)."""
    batch = jnp.broadcast_shapes(lit_position.shape[:-1], jnp.shape(radius))
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), batch)
    to_center = jnp.broadcast_to(position - lit_position, batch + (3,))
    dist2 = dot(to_center, to_center)
    sin2 = radius * radius / jnp.maximum(dist2, 1e-10)
    is_point = sin2 <= _SMALL_SIN2

    # --- cone path ---
    cos_theta_max = jnp.sqrt(_gsafe(1.0 - sin2, 0.0))
    cone_dir, cone_p = cone_sample(cos_theta_max, u2)
    axis = normalize(to_center)
    direction = to_world(cone_dir, axis)
    t = _ray_sphere_t(lit_position, direction, position, radius)
    # Missed due to float imprecision: assume grazing hit.
    t = jnp.where(t <= 0.0, dot(to_center, direction), t)
    area = 4.0 * PI * radius * radius
    radiance_cone = power / jnp.maximum(PI * area, 1e-10)[..., None]

    # --- point-light fallback ---
    dist = jnp.sqrt(_gsafe(dist2, 0.0))
    radiance_point = power / (4.0 * PI * dist2)[..., None]
    dir_point = to_center / jnp.maximum(dist, 1e-10)[..., None]
    t_point = dist - radius

    pick = is_point[..., None]
    return LightSample(
        direction=jnp.where(pick, dir_point, direction),
        distance=jnp.where(is_point, t_point, t) * (1.0 - 1e-6),
        radiance=jnp.where(pick, radiance_point, radiance_cone),
        pdf=jnp.where(is_point, 1.0, cone_p),
        is_delta=jnp.broadcast_to(is_point, cone_p.shape),
    )


def sphere_light_pdf(position, radius, lit_position, direction):
    to_center = position - lit_position
    sin2 = radius * radius / jnp.maximum(dot(to_center, to_center), 1e-10)
    cos_theta_max = jnp.sqrt(_gsafe(1.0 - sin2, 0.0))
    cos_theta = dot(direction, normalize(to_center))
    valid = (cos_theta >= cos_theta_max) & (sin2 > _SMALL_SIN2)
    return jnp.where(valid, cone_pdf(cos_theta_max), 0.0)


def sphere_light_evaluate(position, radius, power, lit_position):
    """Radiance along any direction that hits the sphere."""
    area = 4.0 * PI * radius * radius
    return power / jnp.maximum(PI * area, 1e-10)[..., None]


# ---------------------------------------------------------------------------
# Spot (disk) light
# ---------------------------------------------------------------------------

def _ray_plane_t(origin, direction, point, normal):
    denom = dot(direction, normal)
    t = dot(point - origin, normal) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    return t


def spot_light_evaluate(position, radius, light_dir, cos_angle, power,
                        lit_position, direction):
    cos_theta = -dot(light_dir, direction)
    norm = TWO_PI * (1.0 - cos_angle)
    is_delta = radius == 0.0
    d2 = jnp.sum(jnp.square(position - lit_position), axis=-1)
    area = PI * radius * radius
    norm = norm * jnp.where(is_delta, d2, area * cos_theta)
    radiance = power / jnp.maximum(norm, 1e-10)[..., None]
    return jnp.where((cos_theta > cos_angle)[..., None], radiance, 0.0)


def spot_light_sample(position, radius, light_dir, cos_angle, power,
                      lit_position, u2) -> LightSample:
    """Cone-or-disk sampling (SpotLightImpl.h:77-131), branch-free."""
    is_delta = radius == 0.0

    # Delta path.
    to_light = position - lit_position
    dist = length(to_light)
    dir_delta = to_light / jnp.maximum(dist, 1e-10)[..., None]

    # Decide cone vs disk: cone radius where the lit point's plane cuts it.
    t_plane = _ray_plane_t(lit_position, -light_dir, position, light_dir)
    cone_radius_at = t_plane * jnp.sqrt(
        _gsafe(1.0 - cos_angle * cos_angle, 0.0)) / jnp.maximum(cos_angle, 1e-9)
    use_cone = (radius > cone_radius_at) & (cos_angle > _MIN_SPOT_CONE)

    # Cone path: sample directions inside the spot cone, pointing backwards.
    cone_dir, cone_p = cone_sample(cos_angle, u2)
    dir_cone = -to_world(cone_dir, light_dir)
    t_cone = _ray_plane_t(lit_position, dir_cone, position, light_dir)
    on_light = jnp.sum(jnp.square(
        lit_position + dir_cone * t_cone[..., None] - position), axis=-1) \
        < radius * radius
    rad_cone = jnp.where(on_light[..., None], spot_light_evaluate(
        position, radius, light_dir, cos_angle, power, lit_position, dir_cone), 0.0)

    # Disk path: sample a point on the disk.
    xy, disk_p = concentric_disk_sample(u2, jnp.maximum(radius, 1e-9))
    tangent = normalize(jnp.cross(
        jnp.where(jnp.abs(light_dir[..., 0:1]) > 0.9,
                  jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0])),
        light_dir))
    bitangent = jnp.cross(light_dir, tangent)
    sampled = position + xy[..., 0:1] * tangent + xy[..., 1:2] * bitangent
    to_s = sampled - lit_position
    dist_disk = length(to_s)
    dir_disk = to_s / jnp.maximum(dist_disk, 1e-10)[..., None]
    cos_theta_disk = -dot(light_dir, dir_disk)
    pdf_disk = disk_p * dist_disk * dist_disk / jnp.maximum(cos_theta_disk, 1e-9)
    rad_disk = spot_light_evaluate(
        position, radius, light_dir, cos_angle, power, lit_position, dir_disk)

    use_cone_b = use_cone & ~is_delta
    direction = jnp.where(is_delta[..., None], dir_delta,
                          jnp.where(use_cone_b[..., None], dir_cone, dir_disk))
    distance = jnp.where(is_delta, dist,
                         jnp.where(use_cone_b, t_cone, dist_disk)) * (1.0 - 1e-6)
    radiance = jnp.where(is_delta[..., None], spot_light_evaluate(
        position, radius, light_dir, cos_angle, power, lit_position, dir_delta),
        jnp.where(use_cone_b[..., None], rad_cone, rad_disk))
    pdf = jnp.where(is_delta, 1.0, jnp.where(use_cone_b, cone_p, pdf_disk))
    return LightSample(direction=direction, distance=distance,
                       radiance=radiance, pdf=pdf,
                       is_delta=jnp.broadcast_to(is_delta, pdf.shape))


def spot_light_pdf(position, radius, light_dir, cos_angle, lit_position, direction):
    cos_theta = -dot(light_dir, direction)
    t_plane = _ray_plane_t(lit_position, -light_dir, position, light_dir)
    cone_radius_at = t_plane * jnp.sqrt(
        _gsafe(1.0 - cos_angle * cos_angle, 0.0)) / jnp.maximum(cos_angle, 1e-9)
    use_cone = (radius > cone_radius_at) & (cos_angle > _MIN_SPOT_CONE)
    pdf_cone = cone_pdf(cos_angle)
    # Disk hit distance.
    t = _ray_plane_t(lit_position, direction, position, light_dir)
    hit_pt = lit_position + direction * t[..., None]
    on_disk = (t >= 0.0) & (jnp.sum(jnp.square(hit_pt - position), axis=-1)
                            < radius * radius)
    pdf_disk = jnp.where(
        on_disk,
        (1.0 / (PI * jnp.maximum(radius * radius, 1e-18)))
        * t * t / jnp.maximum(cos_theta, 1e-9), 0.0)
    valid = (cos_theta > 0.0) & (radius > 0.0)
    return jnp.where(valid, jnp.where(use_cone, pdf_cone, pdf_disk), 0.0)


# ---------------------------------------------------------------------------
# Directional light
# ---------------------------------------------------------------------------

def directional_light_sample(light_dir, radiance, shape=()) -> LightSample:
    direction = jnp.broadcast_to(-light_dir, shape + (3,))
    return LightSample(
        direction=direction,
        distance=jnp.full(shape, 1e30, jnp.float32),
        radiance=jnp.broadcast_to(radiance, shape + (3,)),
        pdf=jnp.ones(shape, jnp.float32),
        is_delta=jnp.ones(shape, bool),
    )


# ---------------------------------------------------------------------------
# Tagged dispatch over a LightArray
# ---------------------------------------------------------------------------

def is_delta_light(lights: LightArray, index, lit_position):
    kind = lights.kind[index]
    radius = lights.radius[index]
    pos = lights.position[index]
    sphere_delta = (radius * radius / jnp.maximum(
        jnp.sum(jnp.square(pos - lit_position), axis=-1), 1e-10)) <= _SMALL_SIN2
    return jnp.where(kind == LIGHT_SPHERE, sphere_delta,
                     jnp.where(kind == LIGHT_SPOT, radius == 0.0, True))


def sample_light(lights: LightArray, index, lit_position, u2) -> LightSample:
    """Sample light ``index`` ([...] int32) as seen from ``lit_position``."""
    kind = lights.kind[index]
    pos = lights.position[index]
    radius = lights.radius[index]
    power = lights.power[index]
    ldir = lights.direction[index]
    cos_angle = lights.cos_angle[index]

    s_sphere = sphere_light_sample(pos, radius, power, lit_position, u2)
    s_spot = spot_light_sample(pos, radius, ldir, cos_angle, power, lit_position, u2)
    s_dir = directional_light_sample(ldir, power, shape=kind.shape)

    def pick(field):
        a, b, c = (getattr(s, field) for s in (s_sphere, s_spot, s_dir))
        k = kind
        if a.ndim > kind.ndim:
            k = kind[..., None]
        return jnp.where(k == LIGHT_SPHERE, a, jnp.where(k == LIGHT_SPOT, b, c))

    return LightSample(*(pick(f) for f in LightSample._fields))


def light_pdf(lights: LightArray, index, lit_position, direction):
    """Solid-angle pdf of sampling ``direction`` from light ``index``
    (0 for delta lights) — the MIS denominator."""
    kind = lights.kind[index]
    pos = lights.position[index]
    radius = lights.radius[index]
    ldir = lights.direction[index]
    cos_angle = lights.cos_angle[index]
    p_sphere = sphere_light_pdf(pos, radius, lit_position, direction)
    p_spot = spot_light_pdf(pos, radius, ldir, cos_angle, lit_position, direction)
    return jnp.where(kind == LIGHT_SPHERE, p_sphere,
                     jnp.where(kind == LIGHT_SPOT, p_spot, 0.0))


def evaluate_light(lights: LightArray, index, lit_position, direction):
    """Radiance from light ``index`` along ``direction`` (for BSDF-sampled
    rays that hit the light, SURVEY.md §2.4 evaluate_intersection)."""
    kind = lights.kind[index]
    pos = lights.position[index]
    radius = lights.radius[index]
    power = lights.power[index]
    ldir = lights.direction[index]
    cos_angle = lights.cos_angle[index]
    e_sphere = sphere_light_evaluate(pos, radius, power, lit_position)
    e_spot = spot_light_evaluate(pos, radius, ldir, cos_angle, power,
                                 lit_position, direction)
    k = kind[..., None]
    return jnp.where(k == LIGHT_SPHERE, e_sphere,
                     jnp.where(k == LIGHT_SPOT, e_spot, 0.0))
