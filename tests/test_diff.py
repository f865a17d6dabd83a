"""Differentiable-rendering tests (BASELINE.md pixel-gradient parity):
gradients vs finite differences, and a small inverse-rendering recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.diff import image_l2_loss, optimize_materials, render_loss_grad
from bifrost3d_tpu.geometry import make_plane, make_sphere
from bifrost3d_tpu.integrator.path_tracer import RenderSettings, render_sample
from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
from bifrost3d_tpu.scene.render_scene import build_render_scene

W, H = 24, 18
SETTINGS = RenderSettings(max_bounce_count=2)


def make_scene(tint=(0.6, 0.4, 0.2), roughness=0.6):
    mats = MaterialArray.build([dielectric(tint, roughness)])
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0, 2.0, 1.0), "radius": 0.2,
         "power": (30, 30, 30)}])
    return build_render_scene(
        [(make_sphere(radius=0.5, slices=24, stacks=12), 0, None)],
        mats, lights, environment_map=np.full((16, 32, 3), 0.2, np.float32))


@pytest.fixture(scope="module")
def camera():
    return perspective_camera(eye=(0, 0.5, 2.2), target=(0, 0, 0))


class TestGradients:
    def test_tint_gradient_matches_finite_differences(self, camera):
        scene = make_scene()
        target = jnp.zeros((H, W, 3))

        def loss_at(tint_r):
            mats = scene.materials._replace(
                tint=scene.materials.tint.at[0, 0].set(tint_r))
            s = scene._replace(materials=mats)
            img = render_sample(s, camera, W, H, 0, SETTINGS)
            return float(image_l2_loss(img, target))

        loss, grads = render_loss_grad(
            scene, camera, target, W, H, jnp.uint32(0), SETTINGS)
        analytic = float(grads.materials.tint[0, 0])

        eps = 1e-2
        fd = (loss_at(0.6 + eps) - loss_at(0.6 - eps)) / (2 * eps)
        # Same RNG for every evaluation ⇒ the FD is low-noise; detached
        # sampling leaves a small bias vs the full derivative.
        np.testing.assert_allclose(analytic, fd, rtol=0.08)

    def test_light_power_gradient_positive(self, camera):
        """Brighter light → brighter image; d(mean)/d(power) > 0 and
        matches finite differences."""
        scene = make_scene()

        def mean_image(power_scale):
            lights = scene.lights._replace(power=scene.lights.power * power_scale)
            s = scene._replace(lights=lights)
            return jnp.mean(render_sample(s, camera, W, H, 0, SETTINGS))

        g = jax.grad(mean_image)(1.0)
        assert float(g) > 0
        eps = 1e-2
        fd = (float(mean_image(1.0 + eps)) - float(mean_image(1.0 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), fd, rtol=0.05)

    def test_environment_tint_gradient(self, camera):
        scene = make_scene()

        def mean_image(tint_scale):
            env = scene.environment._replace(
                tint=scene.environment.tint * tint_scale)
            return jnp.mean(render_sample(
                scene._replace(environment=env), camera, W, H, 0, SETTINGS))

        g = jax.grad(mean_image)(1.0)
        assert float(g) > 0


class TestInverseRendering:
    def test_recover_tint(self, camera):
        """Optimize a wrong tint toward a target render (BASELINE config 5)."""
        target_scene = make_scene(tint=(0.8, 0.2, 0.5))
        target = render_sample(target_scene, camera, W, H, 0, SETTINGS)

        start = make_scene(tint=(0.4, 0.6, 0.3))
        # Same-seed target + fixed samples: the loss has no MC noise floor,
        # so optimization must drive it down hard.
        result = optimize_materials(
            start, camera, target, W, H, steps=24, learning_rate=0.08,
            vary_samples=False, settings=SETTINGS)
        assert result.losses[-1] < 0.25 * result.losses[0], result.losses
        recovered = np.asarray(result.scene.materials.tint[0])
        np.testing.assert_allclose(recovered, [0.8, 0.2, 0.5], atol=0.15)
