"""Environment (infinite-area) light: CDF importance sampling + presampling.

Counterpart of ``Assets/InfiniteAreaLight`` + the renderer's
``EnvironmentMap`` / ``PresampledEnvironmentMap`` (SURVEY.md §2.3, §2.4):

- Per-pixel importance = (r + g + b) · sin(θ) (InfiniteAreaLight.cpp:38-58).
- Height is resampled up to ``MINIMUM_PDF_HEIGHT = 128`` rows so small maps
  still sample well.
- With bilinear filtering the importance is blurred 3x3 with weights
  20/2/1 over 32 so black texels bordering bright ones keep nonzero PDF
  (InfiniteAreaLight.cpp:66-121).
- ``per_pixel_pdf`` is reconstructed from CDF differences scaled by
  w·h/(2π²) — the solid-angle PDF *sans* its 1/sin(θ) factor
  (InfiniteAreaLight.cpp:140-157); sampling divides by sin(θ).
- The presampled variant draws a power-of-two pool of samples once per
  scene change with PMJ-BN randoms in bit-reversed order, and per-bounce
  lookup is just an index hash (PresampledEnvironmentMap.cpp:19-101).

Lat-long mapping matches the reference exactly (Utils.h:288-301):
``direction = -(sinθ·cosφ, cosθ, sinθ·sinφ)`` with φ = 2πu, θ = πv.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.lights.types import LightSample
from bifrost3d_tpu.math.distribution2d import Distribution2D
from bifrost3d_tpu.sampling.hashes import reverse_bits, uint_to_unit_float
from bifrost3d_tpu.sampling.pmj import pmj02_bn_samples

MINIMUM_PDF_HEIGHT = 128
PI = np.float32(np.pi)


def direction_to_latlong_uv(direction):
    u = (jnp.arctan2(direction[..., 2], direction[..., 0]) + PI) * (0.5 / PI)
    v = (jnp.arcsin(jnp.clip(direction[..., 1], -1.0, 1.0)) + PI * 0.5) / PI
    return jnp.stack([u, v], axis=-1)


def latlong_uv_to_direction(uv):
    phi = uv[..., 0] * (2.0 * PI)
    theta = uv[..., 1] * PI
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    return -jnp.stack([sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], axis=-1)


class EnvironmentLight(NamedTuple):
    image: jnp.ndarray          # [h, w, 3] radiance map
    tint: jnp.ndarray           # [3]
    distribution: Distribution2D  # over the (possibly resampled) PDF grid
    per_pixel_pdf: jnp.ndarray  # [ph, pw] solid-angle pdf sans 1/sinθ

    @property
    def pdf_size(self):
        return self.per_pixel_pdf.shape


def _bilinear_sample(image, uv):
    """Bilinear lookup with wrap-u / clamp-v (latlong semantics)."""
    h, w = image.shape[0], image.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    p00 = image[y0c, x0w]
    p10 = image[y0c, x1w]
    p01 = image[y1c, x0w]
    p11 = image[y1c, x1w]
    return ((p00 * (1 - fx) + p10 * fx) * (1 - fy)
            + (p01 * (1 - fx) + p11 * fx) * fy)


def build_environment_light(image, tint=(1.0, 1.0, 1.0),
                            bilinear_filtering: bool = True) -> EnvironmentLight:
    """Build the importance-sampling tables from a latlong radiance map."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[0], img.shape[1]
    ph = max(h, MINIMUM_PDF_HEIGHT)
    resample = ph != h
    pw = w

    if resample:
        # Point-sample the image at the PDF resolution (bilinear).
        vs = (np.arange(ph) + 0.5) / ph
        us = (np.arange(pw) + 0.5) / pw
        uu, vv = np.meshgrid(us, vs)
        uv = jnp.asarray(np.stack([uu, vv], -1), jnp.float32)
        pixels = np.asarray(_bilinear_sample(jnp.asarray(img), uv))
    else:
        pixels = img

    sin_theta = np.sin(np.pi * (np.arange(ph) + 0.5) / ph)[:, None]
    importance = pixels.sum(axis=-1) * sin_theta

    if bilinear_filtering or resample:
        # 3x3 blur, weights 20 center / 2 sides / 1 corners over 32;
        # wrap in x (repeat), clamp in y (InfiniteAreaLight.cpp:66-121).
        p = importance
        left = np.roll(p, 1, axis=1)
        right = np.roll(p, -1, axis=1)
        up = np.concatenate([p[:1], p[:-1]], axis=0)
        down = np.concatenate([p[1:], p[-1:]], axis=0)
        ul = np.concatenate([left[:1], left[:-1]], axis=0)
        dl = np.concatenate([left[1:], left[-1:]], axis=0)
        ur = np.concatenate([right[:1], right[:-1]], axis=0)
        dr = np.concatenate([right[1:], right[-1:]], axis=0)
        importance = (20 * p + 2 * (left + right + up + down)
                      + (ul + dl + ur + dr)) / 32.0

    dist = Distribution2D.build(jnp.asarray(importance))

    # Reconstruct per-pixel solid-angle PDF sans sinθ from CDF diffs.
    marginal_pdf = dist.marginal_cdf[1:] - dist.marginal_cdf[:-1]       # [ph]
    conditional_pdf = dist.conditional_cdf[:, 1:] - dist.conditional_cdf[:, :-1]
    pdf_scale = (pw * ph) / (2.0 * np.pi * np.pi)
    per_pixel_pdf = marginal_pdf[:, None] * conditional_pdf * pdf_scale

    return EnvironmentLight(
        image=jnp.asarray(img),
        tint=jnp.asarray(tint, jnp.float32),
        distribution=dist,
        per_pixel_pdf=jnp.asarray(per_pixel_pdf))


def environment_sample(light: EnvironmentLight, u2) -> LightSample:
    """CDF-search sample (EnvironmentLightImpl.h:22-83)."""
    uv, _ = light.distribution.sample_continuous(u2)
    direction = latlong_uv_to_direction(uv)
    radiance = _bilinear_sample(light.image, uv) * light.tint
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - direction[..., 1] ** 2, 0.0))
    ph, pw = light.pdf_size
    xi = jnp.clip((uv[..., 0] * pw).astype(jnp.int32), 0, pw - 1)
    yi = jnp.clip((uv[..., 1] * ph).astype(jnp.int32), 0, ph - 1)
    pdf = light.per_pixel_pdf[yi, xi] / jnp.maximum(sin_theta, 1e-10)
    pdf = jnp.where(sin_theta == 0.0, 0.0, pdf)
    return LightSample(
        direction=direction,
        distance=jnp.full(pdf.shape, 1e30, jnp.float32),
        radiance=radiance,
        pdf=pdf,
        is_delta=jnp.zeros(pdf.shape, bool))


def environment_pdf(light: EnvironmentLight, direction):
    uv = direction_to_latlong_uv(direction)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - direction[..., 1] ** 2, 0.0))
    ph, pw = light.pdf_size
    xi = jnp.clip((uv[..., 0] * pw).astype(jnp.int32), 0, pw - 1)
    yi = jnp.clip((uv[..., 1] * ph).astype(jnp.int32), 0, ph - 1)
    pdf = light.per_pixel_pdf[yi, xi] / jnp.maximum(sin_theta, 1e-10)
    return jnp.where(sin_theta == 0.0, 0.0, pdf)


def environment_evaluate(light: EnvironmentLight, direction):
    """Radiance of the environment along a (miss) direction."""
    uv = direction_to_latlong_uv(direction)
    return _bilinear_sample(light.image, uv) * light.tint


# ---------------------------------------------------------------------------
# Presampled environment (the reference's default, Defines.h:15)
# ---------------------------------------------------------------------------

class PresampledEnvironmentLight(NamedTuple):
    light: EnvironmentLight
    directions: jnp.ndarray  # [n, 3]
    radiances: jnp.ndarray   # [n, 3]
    pdfs: jnp.ndarray        # [n]

    @property
    def sample_count(self) -> int:
        return int(self.pdfs.shape[0])

    @property
    def nee_enabled(self) -> bool:
        """Pool of one sample means the env had no usable importance
        (PresampledEnvironmentMap.h:64)."""
        return self.sample_count > 1


def presample_environment(light: EnvironmentLight, sample_count: int = 8192,
                          blue_noise_candidates: int = 8) -> PresampledEnvironmentLight:
    """Draw the sample pool CPU-side with PMJ-BN randoms in bit-reversed
    order for stratification coherence (PresampledEnvironmentMap.cpp:62-88)."""
    assert sample_count & (sample_count - 1) == 0, "pool must be power of two"
    u2 = pmj02_bn_samples(sample_count, blue_noise_candidates)
    order = np.asarray(
        reverse_bits(jnp.arange(sample_count, dtype=jnp.uint32))).astype(np.uint64)
    order = (order >> np.uint64(32 - int(np.log2(sample_count)))).astype(np.int64)
    u2 = u2[np.argsort(order)]
    s = environment_sample(light, jnp.asarray(u2))
    return PresampledEnvironmentLight(
        light=light, directions=s.direction, radiances=s.radiance, pdfs=s.pdf)


def presampled_environment_sample(pool: PresampledEnvironmentLight, u) -> LightSample:
    """Index the pool with a uniform random u [...] (GPU path analogue)."""
    n = pool.sample_count
    idx = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    pdf = pool.pdfs[idx]
    return LightSample(
        direction=pool.directions[idx],
        distance=jnp.full(idx.shape, 1e30, jnp.float32),
        radiance=pool.radiances[idx],
        pdf=pdf,
        is_delta=jnp.zeros(idx.shape, bool))
