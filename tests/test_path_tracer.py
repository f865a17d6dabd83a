"""Integration tests for the mesh wavefront path tracer (SURVEY.md §4
RendererFixture analogues, CPU-run): furnace closure, NEE correctness,
cutout/backface semantics, determinism."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.geometry import make_plane, make_sphere
from bifrost3d_tpu.integrator.path_tracer import (
    RenderSettings,
    render_progressive,
    render_sample,
)
from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import MaterialArray, dielectric, emissive, metal
from bifrost3d_tpu.scene.render_scene import build_render_scene

F32 = np.float32
W, H = 32, 24


def T(tx, ty, tz, s=1.0):
    return np.asarray([[s, 0, 0, tx], [0, s, 0, ty], [0, 0, s, tz]], F32)


@pytest.fixture(scope="module")
def furnace_scene():
    """A white diffuse sphere floating in a uniform environment."""
    mats = MaterialArray.build([
        dict(shading_model=1, tint=(1.0, 1.0, 1.0), roughness=0.6)])  # Diffuse
    env = np.full((32, 64, 3), 0.5, F32)
    return build_render_scene(
        [(make_sphere(radius=0.5, slices=48, stacks=24), 0, None)],
        mats, environment_map=env)


class TestFurnace:
    def test_white_sphere_vanishes_in_uniform_environment(self, furnace_scene):
        """Albedo-1 diffuse surface under uniform env L: every pixel == L.
        Exercises trace, shading, env NEE + MIS, and the env miss path."""
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_progressive(
            furnace_scene, cam, W, H, 24,
            RenderSettings(max_bounce_count=6)))
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 0.5, rtol=0.03)
        # Pixel-level: no strong shadowing/brightening anywhere.
        assert np.quantile(img.mean(axis=-1), 0.02) > 0.35
        assert np.quantile(img.mean(axis=-1), 0.98) < 0.65


@pytest.fixture(scope="module")
def lit_plane_scene():
    """A diffuse floor lit by one sphere light straight above."""
    mats = MaterialArray.build([dielectric((0.8, 0.8, 0.8), 0.8)])
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0, 2.0, 0), "radius": 0.1,
         "power": (40, 40, 40)}])
    return build_render_scene(
        [(make_plane(size=8.0), 0, None)], mats, lights)


class TestDirectLighting:
    def test_inverse_square_falloff(self, lit_plane_scene):
        """Irradiance under a small sphere light ≈ P·cos/(4π d²) — validated
        at the floor point right under the light."""
        cam = perspective_camera(eye=(0, 1.0, 3.0), target=(0, 0.0, 0))
        img = np.asarray(render_progressive(
            lit_plane_scene, cam, 48, 36, 32,
            RenderSettings(max_bounce_count=2)))
        # Pixel under the light (floor at origin projects to ~row 16).
        # Radiance = albedo/π · E with E = P/(4π d²) = 40/(4π·4).
        expected = 0.8 / np.pi * 40.0 / (4 * np.pi * 4.0)
        center = img[15:18, 22:28].mean(axis=(0, 1, 2))
        np.testing.assert_allclose(center, expected, rtol=0.2)

    def test_shadowing(self):
        """A blocker between light and floor casts a shadow."""
        mats = MaterialArray.build([
            dielectric((0.8, 0.8, 0.8), 0.8),
            dielectric((0.8, 0.8, 0.8), 0.8)])
        lights = LightArray.build([
            {"kind": LIGHT_SPHERE, "position": (0, 2.0, 0), "radius": 0.05,
             "power": (40, 40, 40)}])
        blocker = make_plane(size=0.8)
        scene = build_render_scene(
            [(make_plane(size=8.0), 0, None), (blocker, 1, T(0, 1.0, 0))],
            mats, lights)
        cam = perspective_camera(eye=(0, 1.2, 3.0), target=(0, 0.0, 0))
        img = np.asarray(render_progressive(
            scene, cam, 48, 36, 16, RenderSettings(max_bounce_count=1)))
        # The floor directly under the blocker is darker than the floor
        # outside the shadow (shadow projects to rows ~16-21, image center).
        shadow = img[17:21, 20:30].mean()
        lit = img[17:21, 2:8].mean()
        assert shadow < 0.5 * lit, (shadow, lit)


class TestMaterialSemantics:
    def test_emissive_surface_visible(self):
        mats = MaterialArray.build([emissive((3.0, 2.0, 1.0))])
        scene = build_render_scene(
            [(make_plane(size=2.0), 0,
              np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0]], F32))],
            mats)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_sample(scene, cam, W, H, 0))
        center = img[H // 2, W // 2]
        np.testing.assert_allclose(center, [3.0, 2.0, 1.0], rtol=1e-3)

    def test_cutout_passthrough(self):
        """Coverage-0 material is invisible; the emissive wall behind shows."""
        mats = MaterialArray.build([
            dict(tint=(1, 0, 0), roughness=0.5, coverage=0.0),
            emissive((0.0, 2.0, 0.0))])
        front = make_plane(size=2.0)
        rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0]], F32)
        back_rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, -1]], F32)
        scene = build_render_scene(
            [(front, 0, rot), (front, 1, back_rot)], mats)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_sample(scene, cam, W, H, 0))
        center = img[H // 2, W // 2]
        np.testing.assert_allclose(center, [0.0, 2.0, 0.0], atol=1e-3)

    def test_backface_culled_plane_invisible(self):
        """Non-thin-walled plane seen from behind is skipped; thin-walled
        is shaded (MonteCarlo.cu:146-150)."""
        base = dict(tint=(1, 0, 0), roughness=0.5)
        for flags, expect_visible in ((0, False), (1, True)):  # 1 = THIN_WALLED
            mats = MaterialArray.build([
                dict(**base, flags=flags), emissive((0, 0, 5.0))])
            # Plane facing AWAY from the camera (+z normal becomes -z view).
            rot = np.asarray([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0]], F32)
            back_rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, -1]], F32)
            scene = build_render_scene(
                [(make_plane(size=2.0), 0, rot),
                 (make_plane(size=4.0), 1, back_rot)], mats)
            cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
            img = np.asarray(render_sample(scene, cam, W, H, 0))
            center = img[H // 2, W // 2]
            if expect_visible:
                assert center[2] < 4.0  # blue wall occluded by the plane
            else:
                np.testing.assert_allclose(center, [0, 0, 5.0], atol=1e-3)


class TestDeterminism:
    def test_bitwise_repeatable(self, furnace_scene):
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        a = np.asarray(render_sample(furnace_scene, cam, W, H, 3))
        b = np.asarray(render_sample(furnace_scene, cam, W, H, 3))
        np.testing.assert_array_equal(a, b)

    def test_accumulations_decorrelated(self, furnace_scene):
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        a = np.asarray(render_sample(furnace_scene, cam, W, H, 1))
        b = np.asarray(render_sample(furnace_scene, cam, W, H, 2))
        assert not np.array_equal(a, b)
