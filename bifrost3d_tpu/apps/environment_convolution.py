"""EnvironmentConvolution app — GGX-prefilters an environment map.

Counterpart of ``apps/dev/EnvironmentConvolution/main.cpp`` (SURVEY.md
§2.7): loads a latlong environment map, convolves it with the GGX lobe at
a series of roughness values, and writes one image per level. The compute
path is the same :mod:`bifrost3d_tpu.preview.ibl` chain the preview
renderer uses for IBL, so the app doubles as its visual inspector.

Usage:
    python -m bifrost3d_tpu.apps.environment_convolution env.exr \\
        --roughness 0.0,0.25,0.5,0.75,1.0 --output-dir out/ [--samples 256]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="GGX-convolve an environment map (IBL prefilter)")
    parser.add_argument("environment", help=".exr/.png/.jpg latlong map")
    parser.add_argument("--roughness", default="0.0,0.25,0.5,0.75,1.0",
                        help="comma-separated roughness per output level")
    parser.add_argument("--samples", type=int, default=256,
                        help="GGX samples per texel")
    parser.add_argument("--output-dir", "-o", default=".")
    parser.add_argument("--format", choices=("exr", "png"), default=None,
                        help="output format (default: match the input)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from bifrost3d_tpu.io.image import load_image, save_image, load_exr, save_exr
    from bifrost3d_tpu.preview.ibl import convolve_environment

    is_exr = args.environment.lower().endswith(".exr")
    env = load_exr(args.environment) if is_exr else load_image(args.environment)
    env = jnp.asarray(np.asarray(env, np.float32)[..., :3])
    roughness = [float(r) for r in args.roughness.split(",")]

    t0 = time.time()
    mips = convolve_environment(env, roughness_levels=roughness,
                                samples=args.samples)
    out_format = args.format or ("exr" if is_exr else "png")
    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.environment))[0]
    for r, mip in mips:
        name = os.path.join(args.output_dir,
                            f"{base}_ggx_{r:.2f}.{out_format}")
        if out_format == "exr":
            save_exr(name, np.asarray(mip))
        else:
            save_image(name, np.asarray(mip))
        print(f"roughness {r:.2f}: {mip.shape[1]}x{mip.shape[0]} -> {name}")
    print(f"convolved {len(roughness)} levels in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
