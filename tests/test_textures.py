"""Texture system tests: bank sampling, mipmaps/SAT (Assets/Image analogues),
and textured rendering through the integrator."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.geometry import make_plane
from bifrost3d_tpu.integrator.path_tracer import RenderSettings, render_sample
from bifrost3d_tpu.io.texture import (
    FILTER_LINEAR,
    FILTER_NONE,
    TextureBank,
    WRAP_CLAMP,
    WRAP_REPEAT,
    fill_mipmaps,
    sample_texture,
    sat_region_average,
    summed_area_table,
    unorm8_decode,
    unorm8_encode,
    unorm16_decode,
    unorm16_encode,
)
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import MaterialArray
from bifrost3d_tpu.scene.render_scene import build_render_scene


def checker(n=8, c0=(1, 0, 0), c1=(0, 0, 1)):
    img = np.zeros((n, n, 3), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    mask = (xx + yy) % 2 == 0
    img[mask] = c0
    img[~mask] = c1
    return img


class TestTextureBank:
    def test_nearest_fetch(self):
        bank = TextureBank.build([
            dict(image=checker(4), filter=FILTER_NONE)])
        # v=1 maps to image row 0 (top); texel (0,0) is c0 red.
        uv = jnp.asarray([[0.125, 0.875], [0.375, 0.875]])
        out = np.asarray(sample_texture(bank, jnp.asarray([0, 0]), uv))
        np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(out[1, :3], [0, 0, 1], atol=1e-5)

    def test_default_for_untextured(self):
        bank = TextureBank.build([dict(image=checker(4))])
        out = np.asarray(sample_texture(
            bank, jnp.asarray([-1]), jnp.asarray([[0.5, 0.5]])))
        np.testing.assert_allclose(out[0], [1, 1, 1, 1])

    def test_bilinear_interpolates(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = img[1, 1] = 1.0
        bank = TextureBank.build([
            dict(image=img, filter=FILTER_LINEAR, wrap_u=WRAP_CLAMP,
                 wrap_v=WRAP_CLAMP)])
        out = np.asarray(sample_texture(
            bank, jnp.asarray([0]), jnp.asarray([[0.5, 0.5]])))
        np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-5)

    def test_wrap_modes(self):
        img = np.zeros((1, 4, 3), np.float32)
        img[0, 0] = 1.0
        for wrap, expect in ((WRAP_REPEAT, 1.0), (WRAP_CLAMP, 0.0)):
            bank = TextureBank.build([
                dict(image=img, filter=FILTER_NONE, wrap_u=wrap)])
            out = np.asarray(sample_texture(
                bank, jnp.asarray([0]), jnp.asarray([[1.124, 0.5]])))
            np.testing.assert_allclose(out[0, 0], expect, atol=1e-5)


class TestImageUtils:
    def test_mipmaps_preserve_mean(self):
        img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        mips = fill_mipmaps(img)
        assert len(mips) == 5
        for m in mips:
            np.testing.assert_allclose(m.mean(), img.mean(), rtol=1e-5)
        assert mips[-1].shape[:2] == (1, 1)

    def test_summed_area_table(self):
        img = np.random.default_rng(1).random((8, 8, 3))
        sat = summed_area_table(img)
        avg = sat_region_average(sat, 2, 1, 5, 6)
        np.testing.assert_allclose(avg, img[1:7, 2:6].mean(axis=(0, 1)), rtol=1e-10)

    def test_unorm_roundtrip(self):
        x = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(
            np.asarray(unorm8_decode(unorm8_encode(x))), np.asarray(x), atol=1 / 255)
        np.testing.assert_allclose(
            np.asarray(unorm16_decode(unorm16_encode(x))), np.asarray(x), atol=1 / 65535)


class TestTexturedRendering:
    def test_checker_tint_texture_shows_in_render(self):
        """A checkered tint-roughness texture on a floor under a uniform
        environment: rendered pixels alternate between red and blue."""
        bank = TextureBank.build([
            dict(image=np.concatenate(
                [checker(8), np.ones((8, 8, 1), np.float32)], -1),
                filter=FILTER_NONE)])
        mats = MaterialArray.build([
            dict(shading_model=1, tint=(1.0, 1.0, 1.0), roughness=0.6,
                 tint_roughness_texture=0)])
        env = np.full((16, 32, 3), 1.0, np.float32)
        scene = build_render_scene(
            [(make_plane(size=2.0), 0, None)], mats,
            environment_map=env, textures=bank)
        cam = perspective_camera(eye=(0, 2.0, 0.4), target=(0, 0, 0))
        img = np.asarray(render_sample(
            scene, cam, 32, 32, 0, RenderSettings(max_bounce_count=1)))
        # Red and blue regions both present and distinct.
        red = (img[..., 0] > 2 * img[..., 2] + 0.05).mean()
        blue = (img[..., 2] > 2 * img[..., 0] + 0.05).mean()
        assert red > 0.15 and blue > 0.15, (red, blue)

    def test_coverage_texture_cutout(self):
        """Coverage texture 0 on half the quad: that half passes through to
        the green emissive wall behind."""
        cov = np.ones((8, 8, 1), np.float32)
        cov[:, 4:] = 0.0
        bank = TextureBank.build([dict(image=cov, filter=FILTER_NONE)])
        mats = MaterialArray.build([
            dict(tint=(1, 0, 0), roughness=0.5, coverage_texture=0),
            dict(tint=(0, 0, 0), emission=(0, 3, 0))])
        rot = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0]], np.float32)
        back = np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, -1]], np.float32)
        scene = build_render_scene(
            [(make_plane(size=2.0), 0, rot), (make_plane(size=4.0), 1, back)],
            mats, textures=bank)
        cam = perspective_camera(eye=(0, 0, 2.0), target=(0, 0, 0))
        img = np.asarray(render_sample(
            scene, cam, 32, 32, 0, RenderSettings(max_bounce_count=1)))
        # The camera faces -z, so screen-left shows the quad's u>0.5 half
        # (the cutout region); screen-right is covered.
        cutout_side = img[16, 6]
        covered_side = img[16, 26]
        assert cutout_side[1] > 2.5      # green emissive wall shows through
        assert covered_side[1] < 0.5     # blocked by the red quad


class TestTrilinearMipChain:
    """Render-time trilinear minification (Texture.h:26-60, VERDICT r3 #6)."""

    def _checker_bank(self, filt):
        import numpy as np
        from bifrost3d_tpu.io.texture import TextureBank
        c = np.indices((64, 64)).sum(axis=0) % 2
        img = np.stack([c, c, c], axis=-1).astype(np.float32)
        return TextureBank.build([dict(image=img, filter=filt)])

    def test_mip_chain_packing(self):
        import numpy as np
        from bifrost3d_tpu.io.texture import FILTER_TRILINEAR
        bank = self._checker_bank(FILTER_TRILINEAR)
        sizes = np.asarray(bank.mip_sizes[0])
        assert int(bank.n_levels[0]) == 7          # 64 → 1
        np.testing.assert_array_equal(sizes[0], [64, 64])
        np.testing.assert_array_equal(sizes[6], [1, 1])
        # Level offsets are cumulative heights.
        offs = np.asarray(bank.mip_offsets[0])
        assert offs[1] == 64 and offs[2] == 96
        # Deep mip of a 50% checker is the mean color.
        data = np.asarray(bank.data[0])
        np.testing.assert_allclose(data[offs[6], 0, :3], 0.5, atol=1e-5)

    def test_level0_matches_bilinear_default(self):
        import numpy as np
        import jax.numpy as jnp
        from bifrost3d_tpu.io.texture import FILTER_LINEAR, sample_texture
        bank = self._checker_bank(FILTER_LINEAR)
        rng = np.random.default_rng(3)
        uv = jnp.asarray(rng.random((128, 2)), jnp.float32)
        tid = jnp.zeros(128, jnp.int32)
        a = sample_texture(bank, tid, uv)
        b = sample_texture(bank, tid, uv, footprint_uv=jnp.zeros(128),
                           trilinear=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_large_footprint_converges_to_mean(self):
        import numpy as np
        import jax.numpy as jnp
        from bifrost3d_tpu.io.texture import FILTER_TRILINEAR, sample_texture
        bank = self._checker_bank(FILTER_TRILINEAR)
        uv = jnp.asarray(np.random.default_rng(5).random((64, 2)), jnp.float32)
        tid = jnp.zeros(64, jnp.int32)
        out = sample_texture(bank, tid, uv,
                             footprint_uv=jnp.full(64, 4.0), trilinear=True)
        np.testing.assert_allclose(np.asarray(out[:, :3]), 0.5, atol=1e-3)

    def test_trilinear_reduces_distant_aliasing(self):
        """A distant checkered floor rendered with the trilinear path has
        far less pixel-to-pixel variance than level-0 sampling — the
        aliasing regression VERDICT r3 #6 asks for."""
        import numpy as np
        import jax.numpy as jnp
        from bifrost3d_tpu.geometry import make_plane
        from bifrost3d_tpu.integrator.path_tracer import (
            render_sample, settings_for_scene)
        from bifrost3d_tpu.io.texture import FILTER_TRILINEAR, TextureBank
        from bifrost3d_tpu.lights.types import LIGHT_DIRECTIONAL, LightArray
        from bifrost3d_tpu.scene.camera import perspective_camera
        from bifrost3d_tpu.scene.materials import MaterialArray
        from bifrost3d_tpu.scene.render_scene import build_render_scene

        c = np.indices((256, 256)).sum(axis=0) % 2
        img = np.stack([c, c, c], axis=-1).astype(np.float32)
        bank = TextureBank.build([dict(image=img, filter=FILTER_TRILINEAR)])
        mats = MaterialArray.build([dict(tint=(1, 1, 1), roughness=1.0,
                                         tint_roughness_texture=0)])
        floor = make_plane(size=200.0)
        lights = LightArray.build([
            {"kind": LIGHT_DIRECTIONAL, "direction": (0, -1, 0.2),
             "radiance": (3.0, 3.0, 3.0)}])
        scene = build_render_scene([(floor, 0, None)], mats, lights,
                                   textures=bank)
        cam = perspective_camera(eye=(0, 1.0, 0), target=(0, 0.0, 30.0))
        settings_tri = settings_for_scene(scene, max_bounce_count=0,
                                          next_event_sample_count=1)
        assert settings_tri.trilinear_textures
        settings_l0 = settings_tri._replace(trilinear_textures=False)
        img_tri = np.asarray(render_sample(scene, cam, 64, 64,
                                           jnp.uint32(0), settings_tri))
        img_l0 = np.asarray(render_sample(scene, cam, 64, 64,
                                          jnp.uint32(0), settings_l0))
        # Distant band: rows just below the horizon (far floor).
        horizon = next(i for i in range(64)
                       if img_l0[i].mean() > 1e-4)
        band_tri = img_tri[horizon + 1:horizon + 7].mean(axis=-1)
        band_l0 = img_l0[horizon + 1:horizon + 7].mean(axis=-1)
        # Horizontal (within-row) variation isolates checker aliasing from
        # the legitimate vertical shading falloff.
        row_std_l0 = band_l0.std(axis=1).mean()
        row_std_tri = band_tri.std(axis=1).mean()
        assert row_std_l0 > 2.0 * row_std_tri, (row_std_l0, row_std_tri)
