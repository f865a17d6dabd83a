"""PixelImage asset tests (Assets/Image.h:27-120 semantics, SURVEY §2.3):
formats, mip chain sizes, get/set pixel expansion rules, change_format
with gamma re-encode, summed-area table."""

import numpy as np

from bifrost3d_tpu.io.pixel_image import (
    ALPHA8,
    INTENSITY8,
    INTENSITY_FLOAT,
    RGB24,
    RGB_FLOAT,
    RGBA32,
    RGBA_FLOAT,
    PixelImage,
    channel_count,
    is_byte_format,
)
from bifrost3d_tpu.io.texture import sat_region_average


def test_create_and_sizes():
    img = PixelImage(RGBA32, (8, 4))
    assert img.size == (8, 4, 1)
    assert not img.is_3d
    assert img.data.dtype == np.uint8
    vol = PixelImage(RGB_FLOAT, (4, 4, 4))
    assert vol.is_3d and vol.data.shape == (4, 4, 4, 3)


def test_mipmap_chain_sizes():
    img = PixelImage(RGB_FLOAT, (16, 8))
    img.fill_mipmaps()
    # 16x8 -> 8x4 -> 4x2 -> 2x1 (chain stops at min dimension 1).
    assert img.mipmap_count == 4
    assert img.mip(1).shape == (1, 4, 8, 3)
    assert img.mip(3).shape == (1, 1, 2, 3)


def test_mip_is_box_average():
    data = np.zeros((4, 4, 1), np.float32)
    data[0, 0] = 1.0
    img = PixelImage(INTENSITY_FLOAT, (4, 4), data=data)
    img.fill_mipmaps()
    np.testing.assert_allclose(img.mip(1)[0, 0, 0, 0], 0.25)
    np.testing.assert_allclose(img.mip(2)[0, 0, 0, 0], 1.0 / 16.0)


def test_get_set_pixel_expansion_rules():
    img = PixelImage(ALPHA8, (2, 2))
    img.set_pixel((0.3, 0.5, 0.7, 0.5), 0, 0)
    rgba = img.get_pixel(0, 0)
    np.testing.assert_allclose(rgba, [0, 0, 0, 0.5], atol=1 / 255)

    gray = PixelImage(INTENSITY8, (2, 2))
    gray.set_pixel((0.25,), 1, 1)
    np.testing.assert_allclose(gray.get_pixel(1, 1),
                               [0.25, 0.25, 0.25, 1.0], atol=1 / 255)

    rgb = PixelImage(RGB24, (2, 2))
    rgb.set_pixel((0.2, 0.4, 0.6), 0, 1)
    np.testing.assert_allclose(rgb.get_pixel(0, 1),
                               [0.2, 0.4, 0.6, 1.0], atol=1 / 255)


def test_change_format_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.random((4, 4, 4), np.float32)
    img = PixelImage(RGBA_FLOAT, (4, 4), data=data)
    as_bytes = img.change_format(RGBA32)
    assert as_bytes.data.dtype == np.uint8
    back = as_bytes.change_format(RGBA_FLOAT)
    np.testing.assert_allclose(back.to_float(), img.to_float(), atol=1 / 255)


def test_change_format_gamma_reencode():
    data = np.full((2, 2, 3), 0.25, np.float32)
    linear = PixelImage(RGB_FLOAT, (2, 2), gamma=1.0, data=data)
    srgbish = linear.change_format(RGB_FLOAT, new_gamma=2.2)
    # Stored value must decode (v^gamma) back to the same linear 0.25.
    np.testing.assert_allclose(srgbish.to_float() ** 2.2, 0.25, rtol=1e-5)


def test_intensity_collapse_is_channel_mean():
    data = np.zeros((1, 1, 3), np.float32)
    data[0, 0] = (0.3, 0.6, 0.9)
    img = PixelImage(RGB_FLOAT, (1, 1), data=data)
    gray = img.change_format(INTENSITY_FLOAT)
    np.testing.assert_allclose(gray.to_float()[0, 0, 0, 0], 0.6, rtol=1e-6)


def test_summed_area_table_region_average():
    data = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    img = PixelImage(INTENSITY_FLOAT, (4, 4), data=data)
    sat = img.summed_area_table()
    np.testing.assert_allclose(
        sat_region_average(sat, 1, 1, 3, 2),
        data[1:3, 1:4, 0].mean(), rtol=1e-6)


def test_format_metadata():
    assert channel_count(RGB24) == 3
    assert is_byte_format(RGBA32) and not is_byte_format(RGBA_FLOAT)
