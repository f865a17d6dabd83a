#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"} plus secondary keys.

PRIMARY metric: the flagship mesh wavefront path tracer (BVH/Pallas trace,
DefaultShading, RIS NEE + MIS) on the CornellBox at 512x512 through the
pooled wavefront (compaction + ray regeneration). ``vs_baseline`` is the
speedup over the round-1 architecture — the fixed-iteration dense wavefront
(`render_sample`) measured in the same run on the same hardware — so the
number tracks real integrator-level progress rather than a trivial CPU bar.
Conditions and speed-of-light analysis are recorded in BASELINE.md.

Secondary keys: smallpt rays/s (continuity with BENCH_r01), dense-wavefront
rays/s. ``--full`` adds the 590k-triangle torus-grid clustered-intersector
scene and the ≥175k-tri MaterialScene (7 glTF Mori shader balls).
``--profile`` wraps the primary loop in a jax.profiler trace.
"""

import json
import sys
import time

import numpy as np

REPS = 10


def _rays_per_pixel(scene, settings, camera, probe=(64, 48)):
    """Measured ray segments per pixel-sample: live closest-hit traces plus
    one shadow trace per live lane per wavefront iteration, probed at small
    resolution with the same scene/settings."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from bifrost3d_tpu.integrator import path_tracer as pt

    w, h = probe
    x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.uint32)[None, :], (h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.uint32)[:, None], (h, w))
    accumulation = jnp.uint32(1)
    pixel_hash, _ = pt.pcg2d(x.reshape(-1), y.reshape(-1))
    u_cam = pt.path_rng_4d(accumulation, pixel_hash,
                           jnp.uint32(pt.Dimension.CAMERA))
    xf = (x.reshape(-1).astype(jnp.float32) + u_cam[:, 0]) / w
    yf = 1.0 - (y.reshape(-1).astype(jnp.float32) + u_cam[:, 1]) / h
    from bifrost3d_tpu.scene.camera import camera_ray_directions
    origin, direction = camera_ray_directions(
        camera, jnp.stack([xf, yf], axis=-1))
    flat = origin.shape[0]
    state = pt._PathState(
        origin=origin, direction=direction,
        throughput=jnp.ones((flat, 3), jnp.float32),
        radiance=jnp.zeros((flat, 3), jnp.float32),
        bsdf_pdf=jnp.zeros(flat, jnp.float32),
        bsdf_was_delta=jnp.ones(flat, bool),
        pixel_hash=pixel_hash,
        bounce=jnp.zeros(flat, jnp.uint32),
        active=jnp.ones(flat, bool))
    step = partial(pt._wavefront_step, scene, settings, accumulation)
    total = 0.0
    for _ in range(settings.max_bounce_count + 3):
        live = float(jnp.mean(state.active))
        total += live * 2.0  # closest-hit + shadow trace per live lane
        state = step(state)
    return total


def bench_cornell(profile: bool = False):
    """Primary: mesh CornellBox 512² through the pooled wavefront, and the
    round-1 dense wavefront as the in-run baseline."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample, render_sample_pooled, settings_for_scene)

    scene, cam = create_cornell_box()
    W = H = 512
    settings = settings_for_scene(scene, max_bounce_count=4)
    rpp = _rays_per_pixel(scene, settings, cam)

    pooled = jax.jit(lambda n: render_sample_pooled(
        scene, cam, W, H, n, settings, pool_size=65536))
    dense = jax.jit(lambda n: render_sample(scene, cam, W, H, n, settings))

    def timed(f):
        f(jnp.uint32(0)).block_until_ready()
        t0 = time.perf_counter()
        for n in range(1, REPS + 1):
            out = f(jnp.uint32(n))
        out.block_until_ready()
        return (time.perf_counter() - t0) / REPS

    if profile:
        import jax.profiler
        with jax.profiler.trace("/tmp/bifrost_trace"):
            dt_pooled = timed(pooled)
        print("profile trace written to /tmp/bifrost_trace",
              file=sys.stderr)
    else:
        dt_pooled = timed(pooled)
    dt_dense = timed(dense)

    rays = W * H * rpp
    return {
        "pooled_rays_per_sec": rays / dt_pooled,
        "dense_rays_per_sec": rays / dt_dense,
        "rays_per_pixel": rpp,
        "pooled_ms": dt_pooled * 1e3,
        "dense_ms": dt_dense * 1e3,
    }


def bench_smallpt():
    """Secondary: SmallPT spheres (continuity with BENCH_r01)."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.integrator.smallpt import render_smallpt_accumulation
    from bifrost3d_tpu.scene import smallpt_scene

    W, H = 1024, 768
    scene = smallpt_scene()
    render_smallpt_accumulation(scene, W, H, 1).block_until_ready()
    t0 = time.perf_counter()
    buf = None
    for n in range(2, 2 + REPS):
        frame = render_smallpt_accumulation(scene, W, H, n)
        buf = frame if buf is None else buf + frame
    buf.block_until_ready()
    elapsed = time.perf_counter() - t0
    # Measured in round 1: ~3.45 live rays per pixel-sample (bounce loop).
    rays_per_path = 3.45
    return W * H * REPS * rays_per_path / elapsed


def bench_torus_grid():
    """--full: 590k-triangle torus grid through the cluster-culled Pallas
    intersector (the large-scene path), 65k coherent camera rays."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.geometry import make_torus
    from bifrost3d_tpu.geometry.mesh import combine_meshes, transform_mesh
    from bifrost3d_tpu.geometry.pallas_clustered import (
        clustered_intersect, pack_clustered)

    parts = []
    rng = np.random.default_rng(0)
    for i in range(8):
        for j in range(8):
            m = make_torus(major_segments=96, minor_segments=48)
            M = np.asarray([[1, 0, 0, i * 3 - 12],
                            [0, 1, 0, rng.uniform(-1, 1)],
                            [0, 0, 1, j * 3 - 12]], np.float32)
            parts.append(transform_mesh(m, M))
    mesh = combine_meshes(parts)
    tris = jnp.asarray(np.asarray(mesh.positions)[np.asarray(mesh.indices)])

    eye = np.asarray([0.0, 8.0, -30.0], np.float32)
    W = H = 256
    xs, ys = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H))
    d = np.stack([xs * 0.6, ys * 0.6 - 0.25, np.ones_like(xs)], -1)
    d = d.reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(np.broadcast_to(eye, d.shape).copy())
    d = jnp.asarray(d)

    packed = pack_clustered(tris)
    clu = jax.jit(lambda o, d: clustered_intersect(packed, o, d, 1e-4, jnp.inf))
    jax.block_until_ready(clu(o, d))
    t0 = time.perf_counter()
    for _ in range(REPS):
        h = clu(o, d)
    jax.block_until_ready(h)
    dt = (time.perf_counter() - t0) / REPS
    return {"tris": int(tris.shape[0]),
            "rays_per_sec": d.shape[0] / dt, "trace_ms": dt * 1e3}


def bench_material_scene():
    """--full: the 7-shader-ball glTF MaterialScene (≥175k tris) through
    the full pooled wavefront."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_material_scene
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_pooled, settings_for_scene)

    scene, cam = create_material_scene()
    W = H = 512
    settings = settings_for_scene(scene, max_bounce_count=4)
    rpp = _rays_per_pixel(scene, settings, cam, probe=(32, 24))
    f = jax.jit(lambda n: render_sample_pooled(
        scene, cam, W, H, n, settings, pool_size=65536))
    f(jnp.uint32(0)).block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for n in range(1, reps + 1):
        out = f(jnp.uint32(n))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return {"tris": int(scene.tri_verts.shape[0]),
            "rays_per_sec": W * H * rpp / dt, "frame_ms": dt * 1e3}


def main():
    profile = "--profile" in sys.argv
    cornell = bench_cornell(profile=profile)
    result = {
        "metric": "cornell_wavefront_rays_per_sec",
        "value": round(cornell["pooled_rays_per_sec"]),
        "unit": "rays/s",
        # Speedup over the round-1 architecture (dense fixed-iteration
        # wavefront), measured in the same run — see BASELINE.md.
        "vs_baseline": round(cornell["pooled_rays_per_sec"]
                             / cornell["dense_rays_per_sec"], 2),
        "dense_rays_per_sec": round(cornell["dense_rays_per_sec"]),
        "rays_per_pixel": round(cornell["rays_per_pixel"], 2),
        "frame_ms_512": round(cornell["pooled_ms"], 2),
        "smallpt_rays_per_sec": round(bench_smallpt()),
    }
    if "--full" in sys.argv:
        result["torus_grid_590k"] = {
            k: round(v) if k != "trace_ms" else round(v, 2)
            for k, v in bench_torus_grid().items()}
        result["material_scene_gltf"] = {
            k: round(v) if k != "frame_ms" else round(v, 2)
            for k, v in bench_material_scene().items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
