"""TPU golden records (run manually on the chip; pytest forces CPU).

1. Cornell full-res through the MEGAKERNEL — the product forward path on
   TPU — gated against the reference golden (VERDICT r4 #5: "the product
   path is what the golden gates measure on TPU").
2. A SELF-golden for the current 7-ball MaterialScene (r4 advisor #4):
   rendered once here, stored under tests/data/, and strictly gated by
   tests/test_golden.py's full tier so structural regressions are caught
   even though the reference PNG predates the scene code.

Writes GOLDEN_TPU_r05.json and tests/data/material_scene_selfgolden.png.
"""

import json
import os

import numpy as np

SKY_TINT = (0.68, 0.92, 1.0)


def _pipeline(buf):
    from bifrost3d_tpu.post.pipeline import process
    from bifrost3d_tpu.post.tonemap import TONEMAP_AGX, CameraEffectsSettings
    return np.asarray(process(buf, CameraEffectsSettings.preset()._replace(
        film_grain=0.0, tonemapping_mode=TONEMAP_AGX)))


def _accumulate(scene, cam, W, H, spp, settings, renderer):
    import jax.numpy as jnp
    buf = renderer(scene, cam, W, H, jnp.uint32(0), settings)
    if isinstance(buf, tuple):
        buf = buf[0]
    for n in range(1, spp):
        f = renderer(scene, cam, W, H, jnp.uint32(n), settings)
        if isinstance(f, tuple):
            f = f[0]
        buf = buf + (f - buf) / (n + 1.0)
    return buf


def cornell_megakernel_golden(spp=512):
    import jax.numpy as jnp
    from PIL import Image
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.pallas_mesh import (
        mesh_megakernel_eligible, render_mesh_megakernel)
    from bifrost3d_tpu.integrator.path_tracer import settings_for_scene
    from bifrost3d_tpu.io.compare import mssim, rms
    from bifrost3d_tpu.io.image import srgb_encode_u8

    gold_img = Image.open(
        "/root/reference/apps/SimpleViewer/ReferenceImages/"
        "CornellBox_8192.png").convert("RGB")
    W, H = gold_img.width, gold_img.height
    gold = np.asarray(gold_img, np.float32) / 255.0

    scene, cam = create_cornell_box(aspect=W / float(H))
    scene = scene._replace(
        environment_tint=jnp.asarray(SKY_TINT, jnp.float32))
    settings = settings_for_scene(scene, max_bounce_count=4)
    assert mesh_megakernel_eligible(scene, settings)
    buf = _accumulate(scene, cam, W, H, spp, settings,
                      render_mesh_megakernel)
    ldr = _pipeline(buf)
    ours = srgb_encode_u8(ldr).astype(np.float32) / 255.0
    m = float(mssim(jnp.asarray(gold), jnp.asarray(ours)))
    r = float(rms(jnp.asarray(gold), jnp.asarray(ours)))
    print(f"cornell megakernel golden: MSSIM {m:.4f} RMS {r:.4f} "
          f"({W}x{H}, {spp} spp)", flush=True)
    return {"mssim": m, "rms": r, "spp": spp, "width": W, "height": H}


def material_scene_self_golden(spp=512, W=320, H=240):
    import jax.numpy as jnp
    from PIL import Image
    from bifrost3d_tpu.apps.scenes import create_material_scene
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_fast, settings_for_scene)
    from bifrost3d_tpu.io.image import srgb_encode_u8

    scene, cam = create_material_scene(aspect=W / float(H))
    scene = scene._replace(
        environment_tint=jnp.asarray(SKY_TINT, jnp.float32))
    settings = settings_for_scene(scene, max_bounce_count=4)
    buf = _accumulate(scene, cam, W, H, spp, settings, render_sample_fast)
    ldr = _pipeline(buf)
    out = srgb_encode_u8(ldr)
    os.makedirs("tests/data", exist_ok=True)
    path = "tests/data/material_scene_selfgolden.png"
    Image.fromarray(out).save(path)
    print(f"self-golden written: {path} ({W}x{H}, {spp} spp)", flush=True)
    return {"path": path, "spp": spp, "width": W, "height": H}


def main():
    out = {"date": "2026-08-21",
           "hardware": "TPU v5 lite (1 chip via axon tunnel)",
           "cornell_megakernel": cornell_megakernel_golden(),
           "material_scene_self_golden": material_scene_self_golden()}
    with open("GOLDEN_TPU_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
