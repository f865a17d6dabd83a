"""SimpleViewer: the CLI renderer application.

Counterpart of ``apps/SimpleViewer/main.cpp`` (SURVEY.md §2.7) minus the
interactive window: same CLI surface (--scene / --environment-map /
--environment-tint / --window-size / --camera-position / --camera-rotation)
plus offline-rendering flags (--accumulations, --output, --aov, camera
effects preset). Loads .obj / .gltf / .glb or one of the built-in scenes.

Usage::

    python -m bifrost3d_tpu.apps.simple_viewer --scene CornellBox \
        --accumulations 256 --output cornell.png
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_scene_from_file(path, environment_map, environment_tint):
    import jax.numpy as jnp
    from bifrost3d_tpu.geometry.mesh import mesh_aabb
    from bifrost3d_tpu.io import load_gltf, load_obj
    from bifrost3d_tpu.scene.camera import perspective_camera
    from bifrost3d_tpu.scene.materials import MaterialArray
    from bifrost3d_tpu.scene.render_scene import build_render_scene

    texture_dicts = []
    if path.lower().endswith((".gltf", ".glb")):
        meshes, material_dicts, texture_dicts = load_gltf(path)
    elif path.lower().endswith(".obj"):
        meshes, material_dicts = load_obj(path)
    else:
        raise ValueError(f"unsupported scene file {path}")
    from bifrost3d_tpu.io.texture import TextureBank
    mats = MaterialArray.build(material_dicts)
    instances = [(m, idx, None) for m, idx, _name in meshes]
    scene = build_render_scene(
        instances, mats, environment_map=environment_map,
        environment_tint=environment_tint,
        textures=TextureBank.build(texture_dicts))

    # Frame the scene: camera on the diagonal at 2x the bounding radius.
    lo = np.asarray([np.asarray(m.positions).min(0) for m, _, _ in meshes]).min(0)
    hi = np.asarray([np.asarray(m.positions).max(0) for m, _, _ in meshes]).max(0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) / 2 + 1e-3
    eye = center + np.asarray([0.7, 0.4, -1.0]) * 2.2 * radius
    camera = perspective_camera(eye=tuple(eye), target=tuple(center),
                                fov_radians=np.pi / 4, aspect=1.0)
    return scene, camera


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU path tracer viewer")
    parser.add_argument("--scene", "-s", default="CornellBox",
                        help="built-in scene name or .obj/.gltf/.glb path")
    parser.add_argument("--environment-map", "-e", default=None,
                        help="latlong environment image (png/jpg/hdr/exr)")
    parser.add_argument("--environment-tint", default="0.68,0.92,1.0",
                        help="R,G,B background tint when no map is set (SimpleViewer default, main.cpp:58)")
    parser.add_argument("--window-size", default="512x512")
    parser.add_argument("--camera-position", default=None, help="x,y,z")
    parser.add_argument("--camera-target", default=None, help="x,y,z")
    parser.add_argument("--accumulations", "-n", type=int, default=64)
    parser.add_argument("--max-bounces", type=int, default=4)
    parser.add_argument("--output", "-o", default="render.png")
    parser.add_argument("--aov", default=None,
                        choices=[None, "depth", "albedo", "tint", "roughness",
                                 "shading_normal", "primitive_id"],
                        help="render an AOV instead of the beauty pass")
    parser.add_argument("--tonemapper", default="filmic",
                        choices=["linear", "filmic", "agx", "khronos"])
    parser.add_argument("--path-regularization", type=float, default=0.0)
    parser.add_argument("--high-precision", action="store_true",
                        help="Kahan-compensated accumulation (the TPU "
                        "counterpart of DOUBLE_PRECISION_ACCUMULATION_"
                        "BUFFER, Defines.h:14) for 2048+ spp renders")
    parser.add_argument("--renderer", default="pathtracer",
                        choices=["pathtracer", "preview", "denoised"],
                        help="path tracer, rasterizer-style preview (the "
                             "reference's 'P' toggle), or denoised backend")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="resume progressive accumulation from the "
                             "latest checkpoint here and save new ones")
    parser.add_argument("--checkpoint-every", type=int, default=64,
                        help="checkpoint interval in accumulations")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import SCENES
    from bifrost3d_tpu.integrator.aov import render_aovs
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings,
        render_progressive,
    )
    from bifrost3d_tpu.io import load_image, save_image
    from bifrost3d_tpu.post import CameraEffectsSettings, process
    from bifrost3d_tpu.post.tonemap import (
        TONEMAP_AGX,
        TONEMAP_FILMIC,
        TONEMAP_KHRONOS_NEUTRAL,
        TONEMAP_LINEAR,
    )
    from bifrost3d_tpu.scene.camera import perspective_camera

    width, height = (int(v) for v in args.window_size.split("x"))
    env = load_image(args.environment_map) if args.environment_map else None
    tint = tuple(float(v) for v in args.environment_tint.split(","))

    if args.scene in SCENES:
        # Window aspect feeds the camera like the reference's
        # CameraViewportHandler (main.cpp:350).
        scene, camera = SCENES[args.scene](aspect=width / height)
        if env is not None:
            from bifrost3d_tpu.lights.environment import build_environment_light
            scene = scene._replace(environment=build_environment_light(env))
        scene = scene._replace(environment_tint=jnp.asarray(tint, jnp.float32))
    else:
        scene, camera = build_scene_from_file(args.scene, env, tint)

    if args.camera_position or args.camera_target:
        eye = tuple(float(v) for v in (args.camera_position or "0,0,-2").split(","))
        target = tuple(float(v) for v in (args.camera_target or "0,0,0").split(","))
        camera = perspective_camera(eye=eye, target=target,
                                    fov_radians=np.pi / 4,
                                    aspect=width / height)

    t0 = time.time()
    if args.renderer == "preview" and not args.aov:
        from bifrost3d_tpu.preview import render_preview
        hdr = render_preview(scene, camera, width, height)
        mode = {"linear": TONEMAP_LINEAR, "filmic": TONEMAP_FILMIC,
                "agx": TONEMAP_AGX, "khronos": TONEMAP_KHRONOS_NEUTRAL}[args.tonemapper]
        post = CameraEffectsSettings.preset()._replace(
            tonemapping_mode=mode, film_grain=0.0)
        save_image(args.output, np.asarray(process(hdr, post)))
        print(f"rendered {args.scene} preview {width}x{height} "
              f"in {time.time() - t0:.1f}s -> {args.output}")
        return
    if args.renderer == "denoised" and not args.aov:
        from bifrost3d_tpu.integrator.backend import DenoisedBackend
        backend = DenoisedBackend(
            scene, camera, width, height,
            RenderSettings(max_bounce_count=args.max_bounces))
        for _ in range(args.accumulations):
            hdr = backend.render()
        mode = {"linear": TONEMAP_LINEAR, "filmic": TONEMAP_FILMIC,
                "agx": TONEMAP_AGX, "khronos": TONEMAP_KHRONOS_NEUTRAL}[args.tonemapper]
        post = CameraEffectsSettings.preset()._replace(
            tonemapping_mode=mode, film_grain=0.0)
        save_image(args.output, np.asarray(process(hdr, post)))
        print(f"rendered {args.scene} denoised {width}x{height} "
              f"n={args.accumulations} in {time.time() - t0:.1f}s -> {args.output}")
        return
    if args.aov:
        aovs = render_aovs(scene, camera, width, height)
        img = np.asarray(aovs[args.aov])
        if img.ndim == 2:
            img = img[..., None].repeat(3, -1)
        if args.aov == "shading_normal":
            img = img * 0.5 + 0.5
        save_image(args.output, np.clip(img, 0, 1), from_linear=False)
    else:
        settings = RenderSettings(
            max_bounce_count=args.max_bounces,
            path_regularization_scale=args.path_regularization)
        if args.checkpoint_dir:
            # Durable progressive accumulation: resume → continue → save.
            import os
            from bifrost3d_tpu.integrator.backend import SimpleBackend
            from bifrost3d_tpu.utils import (
                latest_checkpoint, load_checkpoint, save_checkpoint)
            backend = SimpleBackend(scene, camera, width, height, settings)
            resume = latest_checkpoint(args.checkpoint_dir)
            if resume is not None:
                state, step, meta = load_checkpoint(
                    resume, like={"buffer": backend.buffer})
                if meta.get("scene") == args.scene and step < args.accumulations:
                    backend.buffer = state["buffer"]
                    backend.accumulations = step
                    print(f"resumed at accumulation {step} from {resume}")
            while backend.accumulations < args.accumulations:
                hdr = backend.render()
                n = backend.accumulations
                if n % args.checkpoint_every == 0 or n == args.accumulations:
                    save_checkpoint(
                        os.path.join(args.checkpoint_dir, f"ckpt_{n}.npz"),
                        {"buffer": backend.buffer}, step=n,
                        metadata={"scene": args.scene})
        else:
            hdr = render_progressive(scene, camera, width, height,
                                     args.accumulations, settings,
                                     high_precision=args.high_precision)
        mode = {"linear": TONEMAP_LINEAR, "filmic": TONEMAP_FILMIC,
                "agx": TONEMAP_AGX, "khronos": TONEMAP_KHRONOS_NEUTRAL}[args.tonemapper]
        post = CameraEffectsSettings.preset()._replace(
            tonemapping_mode=mode, film_grain=0.0)
        ldr = process(hdr, post)
        save_image(args.output, np.asarray(ldr))
    print(f"rendered {args.scene} {width}x{height} "
          f"n={args.accumulations} in {time.time() - t0:.1f}s -> {args.output}")


if __name__ == "__main__":
    main()
