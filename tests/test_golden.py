"""Golden-image parity tests against the reference's shipped renders.

The reference ships LDR golden images rendered by its OptiX path tracer at
high accumulation counts (``apps/SimpleViewer/ReferenceImages/``, SURVEY.md
§4 item 4). These tests re-render the same scene with OUR integrator and
gate on MSSIM — the reference's own comparison metric (Compare.h:23-184).

Slow (minutes of rendering): skipped unless ``BIFROST_GOLDEN=1``. Measured
2026-08-18 on 1 TPU chip at 512 accumulations: SSIM 0.905, MSSIM 0.922,
RMS 0.141 vs CornellBox_8192.png (residual = sample noise 512 vs 8192 +
film grain in the golden).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = "/root/reference/apps/SimpleViewer/ReferenceImages"

pytestmark = pytest.mark.skipif(
    os.environ.get("BIFROST_GOLDEN") != "1",
    reason="golden renders take minutes; set BIFROST_GOLDEN=1")


def _render_cornell(width, height, accumulations):
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings, render_sample)
    from bifrost3d_tpu.post.pipeline import process
    from bifrost3d_tpu.post.tonemap import CameraEffectsSettings
    from bifrost3d_tpu.scene.camera import perspective_camera

    scene, _ = create_cornell_box()
    # SimpleViewer defaults: sky tint (main.cpp:58), fov π/4, 640x480.
    scene = scene._replace(
        environment_tint=jnp.asarray([0.68, 0.92, 1.0], jnp.float32))
    cam = perspective_camera(eye=(0, 0, -1.5), target=(0, 0, 0),
                             fov_radians=np.pi / 4, aspect=width / height)
    f = jax.jit(lambda n: render_sample(scene, cam, width, height, n,
                                        RenderSettings(max_bounce_count=4)))
    buf = f(jnp.uint32(0))
    for n in range(1, accumulations):
        buf = buf + (f(jnp.uint32(n)) - buf) / (n + 1.0)
    ldr = process(buf, CameraEffectsSettings.preset()._replace(film_grain=0.0))
    return np.asarray(ldr)


def test_cornell_box_matches_reference_golden():
    from PIL import Image
    import jax.numpy as jnp
    from bifrost3d_tpu.io.compare import mssim, rms
    from bifrost3d_tpu.io.image import srgb_encode_u8

    golden_path = os.path.join(GOLDEN_DIR, "CornellBox_8192.png")
    if not os.path.exists(golden_path):
        pytest.skip("reference golden images not mounted")
    gold = np.asarray(Image.open(golden_path).convert("RGB"),
                      np.float32) / 255.0
    n = int(os.environ.get("BIFROST_GOLDEN_ACCUMS", "512"))
    ours = srgb_encode_u8(_render_cornell(gold.shape[1], gold.shape[0], n)
                          ).astype(np.float32) / 255.0
    m = float(mssim(jnp.asarray(gold), jnp.asarray(ours)))
    r = float(rms(jnp.asarray(gold), jnp.asarray(ours)))
    assert m > 0.88, f"MSSIM {m} vs golden (rms {r})"
    assert r < 0.2, f"RMS {r} vs golden"
