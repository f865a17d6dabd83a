"""Render backends: plain progressive and denoised presentation.

Counterpart of the reference's ``IBackend`` (IBackend.h:23-66, SURVEY.md
§2.4): ``SimpleBackend`` = one launch per frame; ``DenoisedBackend``
post-filters the accumulation buffer — where the reference calls the
closed-source OptiX DL denoiser, we run an edge-avoiding à-trous wavelet
filter guided by the normal/albedo AOVs (the feature buffers the reference
feeds its denoiser, SimpleRGPs.cu:149-203), with the same logarithmic
presentation cadence (denoise on power-of-two frames or every 32nd).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bifrost3d_tpu.integrator.aov import render_aovs
from bifrost3d_tpu.integrator.path_tracer import (
    RenderSettings,
    render_sample_fast,
)


class SimpleBackend:
    """One progressive launch per frame + running average accumulation.

    Forward product path: renders through path_tracer.render_sample_fast
    (mesh megakernel on TPU where eligible, pooled compacting wavefront
    otherwise) — the dense fixed-iteration integrator stays reserved for
    autodiff.
    """

    def __init__(self, scene, camera, width: int, height: int,
                 settings: RenderSettings = RenderSettings(),
                 pool_size: int = 65536):
        self.scene = scene
        self.camera = camera
        self.width = width
        self.height = height
        self.settings = settings
        self.pool_size = pool_size
        self.accumulations = 0
        self.buffer = jnp.zeros((height, width, 3), jnp.float32)

    def reset(self) -> None:
        self.accumulations = 0
        self.buffer = jnp.zeros((self.height, self.width, 3), jnp.float32)

    def render(self):
        frame = render_sample_fast(
            self.scene, self.camera, self.width, self.height,
            self.accumulations, self.settings, self.pool_size)
        self.accumulations += 1
        self.buffer = self.buffer + (frame - self.buffer) / self.accumulations
        return self.buffer


def _atrous_pass(color, normal, albedo, step: int,
                 sigma_color=4.0, sigma_normal=128.0, sigma_albedo=8.0):
    """One edge-avoiding à-trous iteration with 5-tap B3 spline weights."""
    taps = [-2, -1, 0, 1, 2]
    kernel = jnp.asarray([1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16], jnp.float32)
    h, w = color.shape[0], color.shape[1]
    acc = jnp.zeros_like(color)
    weight_sum = jnp.zeros(color.shape[:2] + (1,), jnp.float32)

    def shifted(img, dy, dx):
        return jnp.roll(img, (-dy * step, -dx * step), axis=(0, 1))

    for iy, ty in enumerate(taps):
        for ix, tx in enumerate(taps):
            k = kernel[iy] * kernel[ix]
            c = shifted(color, ty, tx)
            n = shifted(normal, ty, tx)
            a = shifted(albedo, ty, tx)
            w_c = jnp.exp(-jnp.sum(jnp.square(c - color), -1, keepdims=True)
                          * sigma_color)
            w_n = jnp.exp(-jnp.maximum(
                1.0 - jnp.sum(n * normal, -1, keepdims=True), 0.0) * sigma_normal)
            w_a = jnp.exp(-jnp.sum(jnp.square(a - albedo), -1, keepdims=True)
                          * sigma_albedo)
            wgt = k * w_c * w_n * w_a
            acc = acc + c * wgt
            weight_sum = weight_sum + wgt
    return acc / jnp.maximum(weight_sum, 1e-8)


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(color, normal, albedo, iterations: int = 4):
    """Edge-avoiding à-trous wavelet denoise (Dammertz et al. 2010)."""
    out = color
    for i in range(iterations):
        out = _atrous_pass(out, normal, albedo, step=1 << i)
    return out


class DenoisedBackend(SimpleBackend):
    """SimpleBackend + guided denoise with logarithmic presentation cadence
    (IBackend.cpp:19-80: denoise on power-of-2 frames or every 32nd)."""

    def __init__(self, *args, denoise_iterations: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.denoise_iterations = denoise_iterations
        self._aovs = None
        self._denoised = None

    def _should_denoise(self) -> bool:
        n = self.accumulations
        is_pow2 = (n & (n - 1)) == 0
        return n > 0 and (is_pow2 or n % 32 == 0) or self._denoised is None

    def render(self):
        super().render()
        if self._aovs is None:
            self._aovs = render_aovs(self.scene, self.camera,
                                     self.width, self.height)
        if self._should_denoise():
            self._denoised = atrous_denoise(
                self.buffer, self._aovs["shading_normal"], self._aovs["albedo"],
                self.denoise_iterations)
        return self._denoised

    def reset(self) -> None:
        super().reset()
        self._aovs = None
        self._denoised = None
