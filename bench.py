#!/usr/bin/env python
"""Benchmark harness: SmallPT Cornell-box rays/s on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the self-measured CPU float64 numpy reference implementation of the
same estimator (tests/smallpt_reference.py) — the "SmallPT CPU reference"
parity baseline called for by BASELINE.json.
"""

import json
import sys
import time

import numpy as np


def count_rays_per_path():
    """Average primary+bounce rays per path, measured from the live mask.

    Conservative accounting: we count one ray per wavefront lane per bounce
    that is still live at that bounce (shadow rays don't exist in SmallPT).
    """
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.integrator import smallpt as S
    from bifrost3d_tpu.scene import smallpt_scene

    scene = smallpt_scene()
    # Instrument: run the bounce loop at small size, count live lanes.
    W, H = 64, 48
    x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None, :], (H, W))
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32)[:, None], (H, W))

    # Re-run the ray generation to get initial state, then step manually.
    # (Duplicates a little logic; kept separate from the hot path on purpose.)
    from bifrost3d_tpu.math.vec import cross, normalize
    from bifrost3d_tpu.sampling.hashes import jenkins_hash, lcg_next, reverse_bits

    acc = jnp.uint32(1)
    cam_o = jnp.asarray(S.SMALLPT_CAM_ORIGIN, jnp.float32)
    cam_d = normalize(jnp.asarray(S.SMALLPT_CAM_DIRECTION, jnp.float32))
    cx = jnp.asarray([W * 0.5135 / H, 0.0, 0.0], jnp.float32)
    cy = normalize(cross(cx, cam_d)) * 0.5135
    sx, sy = acc % 2, (acc >> jnp.uint32(1)) % 2
    index = (y * 2 + sy) * (W * 2) + x * 2 + sx
    rng = jenkins_hash(index) ^ reverse_bits(acc)
    rng, u1 = lcg_next(rng)
    rng, u2 = lcg_next(rng)
    dx, dy = S._tent_jitter(u1), S._tent_jitter(u2)
    d = (cx * (((sx.astype(jnp.float32) + 0.5 + dx) / 2 + x.astype(jnp.float32)) / W - 0.5)[..., None]
         + cy * (((sy.astype(jnp.float32) + 0.5 + dy) / 2 + y.astype(jnp.float32)) / H - 0.5)[..., None]
         + cam_d)
    state = (cam_o + d * 140.0, normalize(d),
             jnp.ones((H, W, 3), jnp.float32), jnp.zeros((H, W, 3), jnp.float32),
             rng, jnp.ones((H, W), bool))
    total = 0.0
    for depth in range(S.MAX_DEPTH):
        total += float(jnp.mean(state[5]))
        state = S._bounce(scene, state, depth)
    return total


def bench_mesh_cornell(reps: int = 5):
    """Secondary benchmark: the mesh CornellBox through the full wavefront
    integrator (BVH/brute trace, DefaultShading, RIS NEE + MIS)."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import RenderSettings, render_sample

    scene, cam = create_cornell_box()
    W = H = 256
    settings = RenderSettings(max_bounce_count=4)
    f = jax.jit(lambda n: render_sample(scene, cam, W, H, n, settings))
    f(jnp.uint32(0)).block_until_ready()
    t0 = time.perf_counter()
    for n in range(1, reps + 1):
        f(jnp.uint32(n)).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    # 7 wavefront iterations, one camera/bounce ray + one shadow ray each.
    return W * H * 7 * 2 / dt


def main():
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.integrator.smallpt import render_smallpt_accumulation
    from bifrost3d_tpu.scene import smallpt_scene

    W, H = 1024, 768
    scene = smallpt_scene()
    dev = jax.devices()[0]
    scene = jax.device_put(scene, dev)

    # Warmup/compile.
    render_smallpt_accumulation(scene, W, H, 1).block_until_ready()

    reps = 10
    t0 = time.perf_counter()
    buf = None
    for n in range(2, 2 + reps):
        frame = render_smallpt_accumulation(scene, W, H, n)
        buf = frame if buf is None else buf + frame
    buf.block_until_ready()
    elapsed = time.perf_counter() - t0

    rays_per_path = count_rays_per_path()
    rays_per_sec = W * H * reps * rays_per_path / elapsed

    # CPU numpy reference throughput (the self-measured baseline).
    sys.path.insert(0, "tests")
    import smallpt_reference as ref
    t0 = time.perf_counter()
    ref.render_frame(256, 192, 1)
    cpu_elapsed = time.perf_counter() - t0
    cpu_rays_per_sec = 256 * 192 * rays_per_path / cpu_elapsed

    result = {
        "metric": "smallpt_rays_per_sec",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / cpu_rays_per_sec, 2),
    }
    if "--full" in sys.argv:
        result["mesh_cornell_ray_segments_per_sec"] = round(bench_mesh_cornell())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
