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


def test_render_scene_stores_octahedral_normals(furnace_scene):
    """RenderScene carries int16 oct-encoded corner normals (Types.h:116-119)
    and the attribute-stage decode reproduces the mesh's unit normals."""
    from bifrost3d_tpu.scene.render_scene import corner_normals

    assert furnace_scene.tri_normals_oct.dtype == jnp.int16
    assert furnace_scene.tri_normals_oct.shape[-1] == 2
    mesh = make_sphere(radius=0.5, slices=48, stacks=24)
    expected = np.asarray(mesh.normals)[np.asarray(mesh.indices)]
    expected /= np.linalg.norm(expected, axis=-1, keepdims=True)
    decoded = np.asarray(corner_normals(
        furnace_scene, jnp.arange(furnace_scene.tri_verts.shape[0])))
    np.testing.assert_allclose(decoded, expected, atol=2e-4)


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


class TestCutoutAndCoverage:
    def _two_walls(self, front_mat, textures=None):
        """An emissive wall behind a test plane, camera looking at both."""
        mats = MaterialArray.build([front_mat, emissive((0.0, 2.0, 0.0))])
        front = make_plane(size=2.0)
        rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0]], F32)
        back_rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, -1]], F32)
        return build_render_scene(
            [(front, 0, rot), (front, 1, back_rot)], mats, textures=textures)

    def test_cutout_threshold_binarizes_texture(self):
        """FLAG_CUTOUT: coverage tex < threshold → hole, else opaque
        (Types.h:405-413) — NOT stochastic transparency."""
        from bifrost3d_tpu.io.texture import FILTER_NONE, TextureBank
        from bifrost3d_tpu.scene.materials import FLAG_CUTOUT

        # Left half of the texture 0.3, right half 0.8; threshold 0.5.
        tex = np.zeros((2, 2, 1), F32)
        tex[:, 0, 0] = 0.3
        tex[:, 1, 0] = 0.8
        bank = TextureBank.build([{"image": tex, "filter": FILTER_NONE}])
        mat = dict(tint=(1, 0, 0), roughness=0.5, coverage=0.5,
                   flags=FLAG_CUTOUT, coverage_texture=0)
        scene = self._two_walls(mat, textures=bank)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_progressive(
            scene, cam, W, H, 4,
            RenderSettings(max_bounce_count=1)))
        # One horizontal half is a hole (tex 0.3 < 0.5 → green wall shows),
        # the other fully opaque (tex 0.8 ≥ 0.5 → dark red plane). Which
        # half is which depends on the camera's x handedness.
        sides = [img[H // 2, W // 4], img[H // 2, 3 * W // 4]]
        sides.sort(key=lambda p: p[1])
        dark, hole = sides
        np.testing.assert_allclose(hole, [0.0, 2.0, 0.0], atol=1e-3)
        assert dark[1] < 0.5, dark  # green wall hidden behind opaque half
        # Binary: identical across accumulations (no stochastic noise).
        a = np.asarray(render_sample(scene, cam, W, H, 5))
        b = np.asarray(render_sample(scene, cam, W, H, 9))
        np.testing.assert_allclose(a[H // 2, W // 4], b[H // 2, W // 4],
                                   atol=1e-4)

    def test_coverage_aware_shadow_attenuation(self):
        """A coverage-0.6 plane between light and floor attenuates NEE by
        1-coverage instead of fully blocking (MonteCarlo.cu:278-285)."""
        from bifrost3d_tpu.integrator.path_tracer import settings_for_scene

        def floor_scene(blocker_coverage):
            mats = MaterialArray.build([
                dielectric((0.8, 0.8, 0.8), 0.8),
                dict(tint=(0.5, 0.5, 0.5), roughness=0.5,
                     coverage=blocker_coverage, flags=1)])  # thin-walled
            lights = LightArray.build([
                {"kind": LIGHT_SPHERE, "position": (0, 2.0, 0),
                 "radius": 0.05, "power": (40, 40, 40)}])
            return build_render_scene(
                [(make_plane(size=8.0), 0, None),
                 (make_plane(size=3.0), 1, T(0, 1.0, 0))],
                mats, lights)

        cam = perspective_camera(eye=(0, 1.2, 3.0), target=(0, 0.0, 0))

        def shadow_mean(coverage):
            scene = floor_scene(coverage)
            img = np.asarray(render_progressive(
                scene, cam, 48, 36, 16,
                settings_for_scene(scene, max_bounce_count=1)))
            return img[17:21, 20:30].mean()

        full = shadow_mean(1.0)     # opaque blocker
        partial = shadow_mean(0.6)  # 40% of light passes
        none = shadow_mean(0.0)     # invisible blocker
        assert full < 0.2 * none, (full, none)
        np.testing.assert_allclose(partial / none, 0.4, atol=0.12)


class TestSpotLightIntersection:
    def test_bsdf_rays_hit_spot_disk(self):
        """A spot disk light is visible to primary/BSDF rays
        (LightSources/LightSources.cu:31-91)."""
        from bifrost3d_tpu.lights.types import LIGHT_SPOT

        mats = MaterialArray.build([dielectric((0.5, 0.5, 0.5), 0.8)])
        lights = LightArray.build([
            {"kind": LIGHT_SPOT, "position": (0, 0, 0), "radius": 0.5,
             "direction": (0, 0, -1), "cos_angle": 0.7,
             "power": (10, 10, 10)}])
        # Floor far below so the scene isn't empty.
        scene = build_render_scene(
            [(make_plane(size=8.0), 0, T(0, -5.0, 0))], mats, lights)
        cam = perspective_camera(eye=(0, 0, -2.0), target=(0, 0, 0))
        img = np.asarray(render_sample(scene, cam, W, H, 0))
        center = img[H // 2, W // 2]
        # Expected radiance of a disk spot light head-on:
        # power / (2π(1-cos_angle) · πr² · cosθ), cosθ = 1.
        expected = 10.0 / (2 * np.pi * (1 - 0.7) * np.pi * 0.25)
        np.testing.assert_allclose(center, expected, rtol=1e-3)
        # Viewed from the side (outside the cone) the disk is dark.
        cam_side = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img_side = np.asarray(render_sample(scene, cam_side, W, H, 0))
        assert img_side[H // 2, W // 2, 0] < 1e-3


class TestPresampledEnvironmentNEE:
    def _scene(self, pool):
        # Nonuniform env so importance sampling matters: one bright band.
        env = np.full((32, 64, 3), 0.05, F32)
        env[8:12, 20:40] = 4.0
        mats = MaterialArray.build([
            dict(shading_model=1, tint=(0.8, 0.8, 0.8), roughness=0.7)])
        return build_render_scene(
            [(make_sphere(radius=0.5, slices=32, stacks=16), 0, None)],
            mats, environment_map=env, presample_environment=pool)

    def test_pool_matches_cdf_sampling(self):
        """Presampled env NEE converges to the same image as CDF search
        (PresampledEnvironmentMap.cpp vs EnvironmentLightImpl.h)."""
        scene = self._scene(pool=2048)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        s_pool = RenderSettings(max_bounce_count=2,
                                use_presampled_environment=True)
        s_cdf = RenderSettings(max_bounce_count=2,
                               use_presampled_environment=False)
        a = np.asarray(render_progressive(scene, cam, W, H, 48, s_pool))
        b = np.asarray(render_progressive(scene, cam, W, H, 48, s_cdf))
        assert not np.array_equal(a, b)  # genuinely different sampler
        np.testing.assert_allclose(a.mean(axis=(0, 1)), b.mean(axis=(0, 1)),
                                   rtol=0.05)

    def test_pool_of_one_disables_env_nee(self):
        """Pool size 1 → env NEE off (PresampledEnvironmentMap.h:64); the
        environment stays visible through the miss path."""
        scene = self._scene(pool=1)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_sample(
            scene, cam, W, H, 0,
            RenderSettings(max_bounce_count=1,
                           use_presampled_environment=True)))
        # Corner pixel misses the sphere: env radiance visible.
        np.testing.assert_allclose(img[0, 0], 0.05, rtol=1e-3)


class TestDeltaEnergyConservation:
    def test_mirror_preserves_environment_radiance(self):
        """A specularity-1 smooth mirror reflects the uniform environment
        unchanged — catches missing |cos| factors in the delta-lobe
        throughput (MonteCarlo.cu:204-228 convention)."""
        mats = MaterialArray.build([metal((1.0, 1.0, 1.0), 0.0)])
        env = np.full((16, 32, 3), 0.5, F32)
        scene = build_render_scene(
            [(make_sphere(radius=0.5, slices=64, stacks=32), 0, None)],
            mats, environment_map=env)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_progressive(
            scene, cam, W, H, 8, RenderSettings(max_bounce_count=3)))
        # Every pixel (sphere mirror or env miss) must be exactly 0.5;
        # allow tolerance at the silhouette where normals graze.
        assert np.quantile(np.abs(img - 0.5), 0.9) < 0.02


class TestPooledWavefront:
    def test_pooled_matches_dense_wavefront(self, furnace_scene):
        """The compaction + ray-regeneration pool renders the same image as
        the fixed-iteration wavefront (same per-pixel RNG chain)."""
        from bifrost3d_tpu.integrator.path_tracer import render_sample_pooled

        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        settings = RenderSettings(max_bounce_count=4)
        dense = np.asarray(render_sample(
            furnace_scene, cam, W, H, 3, settings))
        # Pool smaller than the pixel count forces several refill rounds.
        pooled = np.asarray(render_sample_pooled(
            furnace_scene, cam, W, H, 3, settings, pool_size=256))
        np.testing.assert_allclose(pooled, dense, atol=1e-6)

    def test_octant_sorted_pool_matches_unsorted(self, furnace_scene):
        """Ray sorting only permutes lanes — each pixel's sample chain is
        keyed by (accumulation, pixel_hash), so the sorted pool renders the
        identical image."""
        from bifrost3d_tpu.integrator.path_tracer import render_sample_pooled

        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        plain = RenderSettings(max_bounce_count=4)
        sort = plain._replace(sort_rays_every=1)
        unsorted = np.asarray(render_sample_pooled(
            furnace_scene, cam, W, H, 3, plain, pool_size=256))
        sorted_ = np.asarray(render_sample_pooled(
            furnace_scene, cam, W, H, 3, sort, pool_size=256))
        np.testing.assert_array_equal(sorted_, unsorted)

    def test_pooled_matches_dense_with_lights_and_mesh(self):
        from bifrost3d_tpu.integrator.path_tracer import render_sample_pooled

        mats = MaterialArray.build([
            dielectric((0.8, 0.8, 0.8), 0.8), metal((0.9, 0.8, 0.6), 0.1)])
        lights = LightArray.build([
            {"kind": LIGHT_SPHERE, "position": (0, 2.0, 0), "radius": 0.1,
             "power": (40, 40, 40)}])
        scene = build_render_scene(
            [(make_plane(size=8.0), 0, None),
             (make_sphere(radius=0.4), 1, T(0, 0.5, 0))], mats, lights)
        cam = perspective_camera(eye=(0, 1.0, 3.0), target=(0, 0.3, 0))
        settings = RenderSettings(max_bounce_count=3)
        dense = np.asarray(render_sample(scene, cam, W, H, 1, settings))
        pooled = np.asarray(render_sample_pooled(
            scene, cam, W, H, 1, settings, pool_size=300))
        np.testing.assert_allclose(pooled, dense, atol=1e-6)


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


def test_high_precision_accumulation_matches_running_mean():
    """Kahan-compensated accumulation (the DOUBLE_PRECISION_ACCUMULATION_
    BUFFER counterpart, Defines.h:14) agrees with the running mean at low
    counts where f32 drift is negligible."""
    import numpy as np
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_progressive, settings_for_scene)

    scene, cam = create_cornell_box()
    settings = settings_for_scene(scene, max_bounce_count=1)
    a = render_progressive(scene, cam, 16, 16, 4, settings)
    b = render_progressive(scene, cam, 16, 16, 4, settings,
                           high_precision=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
