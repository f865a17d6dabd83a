"""SmallPT app — the reference's standalone progressive sphere tracer.

Counterpart of ``apps/SmallPT/main.cpp`` (SURVEY.md §2.7): progressive
accumulation over the 9-sphere Cornell box, '--volumetric' switches to the
smallvpt homogeneous-medium variant, output written as PNG (the reference
presents via GLFW and dumps a PNG on 'P'; a headless TPU host writes the
PNG directly, and the terminal can show progress like the title-bar FPS).

On TPU the forward render dispatches to the Pallas MEGAKERNEL
(integrator/pallas_smallpt.py) — whole paths in one kernel launch; CPU and
the volumetric variant use the jnp wavefront.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def render_progressive(width: int, height: int, accumulations: int,
                       volumetric: bool = False, quiet: bool = False):
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.scene import smallpt_scene

    on_tpu = jax.default_backend() == "tpu"
    if volumetric:
        from bifrost3d_tpu.integrator.smallvpt import (
            render_smallvpt_accumulation)
        from bifrost3d_tpu.scene.spheres import smallvpt_scene
        scene = smallvpt_scene()
        frame_fn = jax.jit(lambda n: render_smallvpt_accumulation(
            scene, width, height, n))
    else:
        scene = smallpt_scene()
        if on_tpu:
            from bifrost3d_tpu.integrator.pallas_smallpt import (
                render_smallpt_megakernel)
            frame_fn = jax.jit(lambda n: render_smallpt_megakernel(
                scene, width, height, n))
        else:
            from bifrost3d_tpu.integrator.smallpt import (
                render_smallpt_accumulation)
            frame_fn = jax.jit(lambda n: render_smallpt_accumulation(
                scene, width, height, n))

    buffer = jnp.zeros((height, width, 3), jnp.float32)
    t0 = time.perf_counter()
    for n in range(1, accumulations + 1):
        frame = frame_fn(jnp.uint32(n))
        # Progressive lerp with 1/n (smallpt.h:144) == running mean.
        buffer = buffer + (frame - buffer) / n
        if not quiet and (n & (n - 1)) == 0:
            dt = time.perf_counter() - t0
            print(f"  {n}/{accumulations} accumulations "
                  f"({n / max(dt, 1e-9):.2f} frames/s)", flush=True)
    jax.block_until_ready(buffer)
    return np.asarray(buffer)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("-n", "--accumulations", type=int, default=64)
    p.add_argument("--volumetric", action="store_true",
                   help="smallvpt: homogeneous scattering medium variant")
    p.add_argument("-o", "--output", default="smallpt.png")
    args = p.parse_args(argv)

    t0 = time.perf_counter()
    img = render_progressive(args.width, args.height, args.accumulations,
                             volumetric=args.volumetric)
    dt = time.perf_counter() - t0

    from bifrost3d_tpu.io.image import save_image
    # smallpt's backbuffer row 0 is the bottom; PNG row 0 is the top.
    save_image(args.output, img[::-1], from_linear=True)
    total_pixels = args.width * args.height * args.accumulations
    print(f"rendered {args.width}x{args.height} n={args.accumulations} "
          f"({'smallvpt' if args.volumetric else 'smallpt'}) in {dt:.1f}s "
          f"({total_pixels / dt / 1e6:.1f}M pixel-samples/s) "
          f"-> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
