"""Gradients of rendered images w.r.t. scene parameters + inverse rendering.

The forward wavefront (bifrost3d_tpu.integrator.path_tracer) is pure jnp
with detached hit queries, so ``jax.grad`` flows from pixel radiance back
to material SoA fields, light powers/positions, and environment tint —
the BASELINE.json "differentiable inverse render" configuration.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bifrost3d_tpu.integrator.path_tracer import (
    RenderSettings,
    render_sample,
)
from bifrost3d_tpu.scene.render_scene import RenderScene


def image_l2_loss(image, target):
    return jnp.mean(jnp.square(image - target))


@partial(jax.jit, static_argnames=("width", "height", "settings", "spp"))
def render_loss_grad(scene: RenderScene, camera, target,
                     width: int, height: int, accumulation,
                     settings: RenderSettings = RenderSettings(),
                     spp: int = 1):
    """→ (loss, grads) where grads is a RenderScene cotangent pytree.

    Gradients flow to every float leaf of the scene (materials, lights,
    environment); integer/geometry buffers get zero cotangents.
    """

    def loss_fn(diff_scene):
        img = 0.0
        for s in range(spp):
            img = img + render_sample(
                diff_scene, camera, width, height, accumulation + s, settings)
        return image_l2_loss(img / spp, target)

    # allow_int: the scene pytree carries int32 index buffers (BVH, material
    # ids); they receive float0 cotangents.
    return jax.value_and_grad(loss_fn, allow_int=True)(scene)


class OptimizeResult(NamedTuple):
    scene: RenderScene
    losses: list


def optimize_materials(scene: RenderScene, camera, target,
                       width: int, height: int,
                       steps: int = 32, learning_rate: float = 5e-2,
                       spp: int = 1, vary_samples: bool = True,
                       settings: RenderSettings = RenderSettings()) -> OptimizeResult:
    """Adam-optimize material parameters to match a target image.

    The inverse-rendering driver (BASELINE.json config 5): gradients are
    masked to the material SoA so geometry/lights stay fixed; tints and
    roughness are reprojected into their valid ranges each step.

    ``vary_samples=False`` keeps the SAME sample sequence every step —
    deterministic optimization against a same-seed target (no MC noise
    floor in the loss); True cycles fresh samples per step (stochastic
    gradient descent over the true expected loss).
    """
    opt = optax.adam(learning_rate)
    params = scene.materials
    opt_state = opt.init((params.tint, params.roughness))

    # Differentiate w.r.t. (tint, roughness) ONLY: the backward graph stays
    # a fraction of the full-scene render_loss_grad (which emits cotangents
    # for every float leaf — env CDFs, textures, vertex buffers).
    @partial(jax.jit, static_argnames=("spp_",))
    def material_loss_grad(tint, roughness, accumulation, spp_):
        def loss_fn(tr):
            mats = scene.materials._replace(tint=tr[0], roughness=tr[1])
            diff_scene = scene._replace(materials=mats)
            img = 0.0
            for s in range(spp_):
                img = img + render_sample(
                    diff_scene, camera, width, height, accumulation + s,
                    settings)
            return image_l2_loss(img / spp_, target)

        return jax.value_and_grad(loss_fn)((tint, roughness))

    losses = []
    for step in range(steps):
        accumulation = step * spp if vary_samples else 0
        loss, g = material_loss_grad(
            params.tint, params.roughness, jnp.uint32(accumulation), spp)
        updates, opt_state = opt.update(g, opt_state)
        new_tint, new_roughness = optax.apply_updates(
            (params.tint, params.roughness), updates)
        params = params._replace(
            tint=jnp.clip(new_tint, 0.0, 1.0),
            roughness=jnp.clip(new_roughness, 0.02, 1.0))
        losses.append(float(loss))
    return OptimizeResult(scene=scene._replace(materials=params), losses=losses)
