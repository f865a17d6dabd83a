"""Preview renderer tests (DX11Renderer analogues, SURVEY.md §4):
G-buffer shading, SSAO behavior, prefiltered IBL."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.apps.scenes import create_cornell_box
from bifrost3d_tpu.preview import convolve_environment, render_preview, sample_ibl
from bifrost3d_tpu.preview.ssao import bilateral_blur, ssao


class TestPreviewRenderer:
    def test_cornell_preview(self):
        scene, cam = create_cornell_box()
        img = np.asarray(render_preview(scene, cam, 48, 48))
        assert img.shape == (48, 48, 3)
        assert np.isnan(img).sum() == 0
        # Red wall on the left, green on the right.
        assert img[24, 3, 0] > img[24, 3, 1]
        assert img[24, 44, 1] > img[24, 44, 0]
        # Not black: lights contribute.
        assert img.mean() > 0.01

    def test_transparent_pass_blends(self):
        """A half-coverage pane in front of a wall blends wall + pane —
        the ray-based analogue of the reference's sorted transparent-model
        pass (DX11Renderer/Renderer.cpp:681-734)."""
        from bifrost3d_tpu.geometry.creation import make_plane
        from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
        from bifrost3d_tpu.scene.materials import MaterialArray
        from bifrost3d_tpu.scene.render_scene import build_render_scene
        from bifrost3d_tpu.scene.camera import perspective_camera

        def build(pane_coverage):
            mats = MaterialArray.build([
                dict(tint=(0.9, 0.1, 0.1)),                      # wall
                dict(tint=(0.1, 0.1, 0.9), coverage=pane_coverage),
            ])
            wall = make_plane(size=4.0)
            pane = make_plane(size=4.0)
            rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0]],
                             np.float32)       # upright, facing camera
            instances = [
                (wall, 0, rot + np.asarray(
                    [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 2.0]],
                    np.float32)),
                (pane, 1, rot),
            ]
            lights = LightArray.build([
                {"kind": LIGHT_SPHERE, "position": (0.0, 0.0, -3.0),
                 "radius": 0.1, "power": (60.0,) * 3}])
            scene = build_render_scene(instances, mats, lights)
            cam = perspective_camera(eye=(0, 0, -4.0), target=(0, 0, 0),
                                     fov_radians=np.pi / 4, aspect=1.0)
            return scene, cam

        opaque_scene, cam = build(1.0)
        opaque = np.asarray(render_preview(opaque_scene, cam, 24, 24,
                                           enable_ssao=False))
        clear_scene, cam = build(0.0)
        clear = np.asarray(render_preview(clear_scene, cam, 24, 24,
                                          enable_ssao=False))
        half_scene, cam = build(0.5)
        blended = np.asarray(render_preview(half_scene, cam, 24, 24,
                                            enable_ssao=False))
        # Front-to-back peeling is exactly back-to-front alpha blending:
        # blend(α) = α·pane + (1−α)·behind, so the α=0.5 frame must equal
        # the average of the α=1 (pane only) and α=0 (wall only) frames.
        np.testing.assert_allclose(blended, 0.5 * opaque + 0.5 * clear,
                                   rtol=1e-4, atol=1e-5)
        # And the pane really attenuates: blue down, wall red up.
        c_opaque, c_blend = opaque[12, 12], blended[12, 12]
        assert c_blend[2] < 0.7 * c_opaque[2]
        assert c_blend[0] > c_opaque[0]
        assert np.isfinite(blended).all()

    def test_ssao_darkens_without_killing_open_areas(self):
        scene, cam = create_cornell_box()
        with_ao = np.asarray(render_preview(scene, cam, 32, 32, enable_ssao=True))
        without = np.asarray(render_preview(scene, cam, 32, 32, enable_ssao=False))
        assert with_ao.mean() <= without.mean() + 1e-6
        assert with_ao.mean() > 0.5 * without.mean()


class TestSSAO:
    def test_flat_plane_unoccluded_corner_occluded(self):
        h = w = 32
        # View-space: flat wall at z=5 vs a concave corner.
        flat_pos = np.zeros((h, w, 3), np.float32)
        xs, ys = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
        flat_pos[..., 0], flat_pos[..., 1], flat_pos[..., 2] = xs, ys, 5.0
        flat_nrm = np.zeros((h, w, 3), np.float32)
        flat_nrm[..., 2] = -1.0
        mask = np.ones((h, w), bool)
        ao_flat = np.asarray(ssao(jnp.asarray(flat_pos), jnp.asarray(flat_nrm),
                                  jnp.asarray(mask)))
        assert ao_flat.mean() > 0.9  # flat surface is open

        corner_pos = flat_pos.copy()
        corner_pos[..., 2] = 5.0 - np.abs(xs)  # ridge toward the viewer
        ao_corner = np.asarray(ssao(jnp.asarray(corner_pos), jnp.asarray(flat_nrm),
                                    jnp.asarray(mask)))
        # The valley floor is more occluded than the flat wall.
        assert ao_corner[:, 14:18].mean() < ao_flat[:, 14:18].mean()

    def test_bilateral_blur_respects_depth_edges(self):
        h = w = 16
        ao = np.random.default_rng(0).random((h, w)).astype(np.float32)
        depth = np.ones((h, w), np.float32)
        depth[:, 8:] = 10.0
        out = np.asarray(bilateral_blur(jnp.asarray(ao), jnp.asarray(depth)))
        # Smoothing within a depth region...
        assert out[:, :6].std() < ao[:, :6].std()
        # ...but means of the two depth regions stay distinct (no bleed).
        assert abs(out[:, :6].mean() - ao[:, :6].mean()) < 0.1


class TestIBL:
    def test_convolution_blurs_with_roughness(self):
        env = np.full((32, 64, 3), 0.05, np.float32)
        env[14:18, 30:34] = 20.0  # bright blob
        mips = convolve_environment(env, samples=32)
        assert mips[0][0] == 0.0
        # Rougher level → lower peak (energy spread out).
        peak0 = np.asarray(mips[0][1]).max()
        peak_last = np.asarray(mips[-1][1]).max()
        assert peak_last < 0.5 * peak0

    def test_sample_ibl_blends(self):
        env = np.full((32, 64, 3), 1.0, np.float32)
        mips = convolve_environment(env, samples=16)
        d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        out = np.asarray(sample_ibl(mips, d, jnp.asarray([0.1, 0.9])))
        # Uniform env stays ~uniform at any roughness.
        np.testing.assert_allclose(out, 1.0, rtol=0.1)


class TestPreviewSpotLight:
    def test_spot_cone_falloff(self):
        """Points inside the spot cone are lit; outside the cone dark
        (LightSources.hlsl cone cutoff, VERDICT r1 weak #7)."""
        from bifrost3d_tpu.geometry import make_plane
        from bifrost3d_tpu.lights.types import LIGHT_SPOT, LightArray
        from bifrost3d_tpu.scene.camera import perspective_camera
        from bifrost3d_tpu.scene.materials import MaterialArray
        from bifrost3d_tpu.scene.render_scene import build_render_scene

        mats = MaterialArray.build([dict(tint=(0.8, 0.8, 0.8),
                                         roughness=0.9)])
        # Narrow spot straight down at the floor center.
        lights = LightArray.build([
            {"kind": LIGHT_SPOT, "position": (0.0, 2.0, 0.0),
             "radius": 0.05, "direction": (0.0, -1.0, 0.0),
             "cos_angle": 0.95, "power": (40.0, 40.0, 40.0)}])
        scene = build_render_scene(
            [(make_plane(size=8.0), 0, None)], mats, lights)
        cam = perspective_camera(eye=(0, 3.0, -3.0), target=(0, 0, 0))
        img = np.asarray(render_preview(scene, cam, 48, 48,
                                        enable_ssao=False))
        assert np.isfinite(img).all()
        h, w = img.shape[:2]
        center = img[h // 2 - 4:h // 2 + 4, w // 2 - 4:w // 2 + 4].mean()
        edge = img[:, :6].mean()
        # Cone cutoff: the lit pool is much brighter than outside.
        assert center > 10.0 * max(edge, 1e-6), (center, edge)
