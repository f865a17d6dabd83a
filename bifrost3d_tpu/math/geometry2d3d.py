"""Small geometric primitives: Plane, Line, Rect, ray intersections, and
image sampling.

Counterparts of ``Math/Plane.h``, ``Math/Line.h`` (least-squares fit used by
the LTC fitting tooling), ``Math/Rect.h``, ``Math/Intersect.h`` (ray-plane /
ray-sphere), and ``Math/ImageSampling.h`` (bilinear/trilinear fetch). All
functions broadcast over leading batch axes; rays that miss return a
negative t (the reference's convention — callers test ``t >= 0``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bifrost3d_tpu.math.vec import dot, normalize


# ---------------------------------------------------------------------------
# Plane: ax + by + cz + d = 0 (Math/Plane.h:25-64)
# ---------------------------------------------------------------------------

class Plane(NamedTuple):
    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray

    @property
    def normal(self):
        return jnp.stack([self.a + 0.0, self.b + 0.0, self.c + 0.0], axis=-1)

    @staticmethod
    def from_point_normal(point, normal):
        point = jnp.asarray(point, jnp.float32)
        normal = jnp.asarray(normal, jnp.float32)
        d = -dot(point, normal)
        return Plane(normal[..., 0], normal[..., 1], normal[..., 2], d)

    @staticmethod
    def from_point_direction(point, direction):
        return Plane.from_point_normal(point, normalize(
            jnp.asarray(direction, jnp.float32)))


def intersect_ray_plane(origin, direction, plane: Plane):
    """Distance t along the ray to the plane (Intersect.h:19-21); negative
    or non-finite when parallel/behind."""
    n = plane.normal
    denom = dot(direction, n)
    return -(dot(origin, n) + plane.d) / jnp.where(
        jnp.abs(denom) < 1e-20, jnp.where(denom < 0, -1e-20, 1e-20), denom)


def intersect_ray_sphere(origin, direction, center, radius):
    """Nearest positive hit distance, or -1 on miss (Intersect.h ray-sphere;
    direction assumed normalized)."""
    oc = jnp.asarray(origin, jnp.float32) - jnp.asarray(center, jnp.float32)
    b = dot(oc, direction)
    c = dot(oc, oc) - jnp.square(jnp.asarray(radius, jnp.float32))
    disc = b * b - c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sqrt_disc
    t1 = -b + sqrt_disc
    t = jnp.where(t0 > 0.0, t0, t1)
    return jnp.where((disc < 0.0) | (t <= 0.0), -1.0, t)


# ---------------------------------------------------------------------------
# Line: y = slope·x + intercept (Math/Line.h)
# ---------------------------------------------------------------------------

class Line(NamedTuple):
    slope: jnp.ndarray
    intercept: jnp.ndarray

    def evaluate(self, x):
        return self.slope * x + self.intercept

    def signed_distance(self, x, y):
        return y - self.evaluate(x)

    @staticmethod
    def through(p0, p1):
        p0 = jnp.asarray(p0, jnp.float32)
        p1 = jnp.asarray(p1, jnp.float32)
        slope = (p1[..., 1] - p0[..., 1]) / (p1[..., 0] - p0[..., 0])
        return Line(slope, p0[..., 1] - slope * p0[..., 0])

    @staticmethod
    def fit(xs, ys):
        """Least-squares fit (Line::fit) over the trailing axis."""
        xs = jnp.asarray(xs, jnp.float32)
        ys = jnp.asarray(ys, jnp.float32)
        mx = jnp.mean(xs, axis=-1, keepdims=True)
        my = jnp.mean(ys, axis=-1, keepdims=True)
        cov = jnp.sum((xs - mx) * (ys - my), axis=-1)
        var = jnp.sum(jnp.square(xs - mx), axis=-1)
        slope = cov / jnp.maximum(var, 1e-20)
        return Line(slope, my[..., 0] - slope * mx[..., 0])


# ---------------------------------------------------------------------------
# Rect (Math/Rect.h): integer/float viewport rectangle
# ---------------------------------------------------------------------------

class Rect(NamedTuple):
    x: int
    y: int
    width: int
    height: int

    @property
    def offset(self):
        return (self.x, self.y)

    @property
    def size(self):
        return (self.width, self.height)


# ---------------------------------------------------------------------------
# ImageSampling (Math/ImageSampling.h): normalized-uv fetches
# ---------------------------------------------------------------------------

def sample_bilinear(image, u, v):
    """Bilinear fetch at normalized (u, v) with half-texel centers and edge
    clamp, matching ImageSampling::bilinear. image [h, w, c]."""
    image = jnp.asarray(image)
    h, w = image.shape[0], image.shape[1]
    x = jnp.clip(jnp.asarray(u, jnp.float32) * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(jnp.asarray(v, jnp.float32) * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    p00, p01 = image[y0, x0], image[y0, x1]
    p10, p11 = image[y1, x0], image[y1, x1]
    return (1 - fy) * ((1 - fx) * p00 + fx * p01) \
        + fy * ((1 - fx) * p10 + fx * p11)


def sample_trilinear(volume, u, v, w):
    """Trilinear fetch into a [d, h, w_, c] volume: 8-corner gather
    (ImageSampling::trilinear). Broadcasts over batched (u, v, w)."""
    volume = jnp.asarray(volume)
    d, h, wd = volume.shape[0], volume.shape[1], volume.shape[2]

    def axis_coords(t, n):
        x = jnp.clip(jnp.asarray(t, jnp.float32) * n - 0.5, 0.0, n - 1.0)
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 1)
        return i0, jnp.minimum(i0 + 1, n - 1), x - i0.astype(jnp.float32)

    x0, x1, fx = axis_coords(u, wd)
    y0, y1, fy = axis_coords(v, h)
    z0, z1, fz = axis_coords(w, d)
    fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]

    def fetch(zi, yi, xi):
        return volume[zi, yi, xi]

    lower = (1 - fy) * ((1 - fx) * fetch(z0, y0, x0) + fx * fetch(z0, y0, x1)) \
        + fy * ((1 - fx) * fetch(z0, y1, x0) + fx * fetch(z0, y1, x1))
    upper = (1 - fy) * ((1 - fx) * fetch(z1, y0, x0) + fx * fetch(z1, y0, x1)) \
        + fy * ((1 - fx) * fetch(z1, y1, x0) + fx * fetch(z1, y1, x1))
    return (1 - fz) * lower + fz * upper
