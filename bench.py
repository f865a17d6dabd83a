#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"} plus secondary keys.

PRIMARY metric: the flagship mesh wavefront path tracer (Pallas trace,
DefaultShading, RIS NEE + MIS) on the CornellBox at 512x512 through the
pooled wavefront (compaction + ray regeneration) — the code path every
product surface (SimpleBackend, simple_viewer, sharded/multi-host renders)
ships through. The ray count is EXACT, tallied in-run inside the wavefront
loop (live lanes × 2 traces per iteration), not extrapolated from a probe.
``vs_baseline`` is the speedup over the round-1 architecture — the dense
fixed-iteration wavefront (`render_sample`, the autodiff path) measured on
the same rays in the same run. Conditions + speed-of-light analysis:
BASELINE.md.

Secondary keys:
- smallpt_rays_per_sec: SmallPT spheres at the MEASURED live-ray count per
  path (~6.55 at 1024x768). BENCH_r02's 14.4M used a hardcoded 3.45
  rays/path with identical wall-clock — see BASELINE.md for the series
  reconciliation (there was no regression).
- train_step_ms / backward-pass rays/s: one jitted value_and_grad step of
  the inverse renderer (material params) on the CornellBox.
- torus_grid_590k: 589,824-triangle torus grid through the hierarchical
  cluster-culled Pallas intersector (the large-scene path).
- material_scene_gltf: the 7-shader-ball glTF MaterialScene through the
  full pooled wavefront.

``--profile`` wraps the primary loop in a jax.profiler trace.
``--quick`` skips the large scenes (dev iteration).
"""

import json
import sys
import time

import numpy as np

REPS = 10


def bench_cornell(profile: bool = False):
    """Primary: mesh CornellBox 512² pooled wavefront + dense baseline."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample, render_sample_pooled_counted, settings_for_scene)

    scene, cam = create_cornell_box()
    W = H = 512
    settings = settings_for_scene(scene, max_bounce_count=4)

    pooled = jax.jit(lambda n: render_sample_pooled_counted(
        scene, cam, W, H, n, settings, pool_size=65536))
    dense = jax.jit(lambda n: render_sample(scene, cam, W, H, n, settings))

    def timed(f):
        jax.block_until_ready(f(jnp.uint32(0)))
        t0 = time.perf_counter()
        out = None
        for n in range(1, REPS + 1):
            out = f(jnp.uint32(n))
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / REPS, out

    if profile:
        import jax.profiler
        with jax.profiler.trace("/tmp/bifrost_trace"):
            dt_pooled, out = timed(pooled)
        print("profile trace written to /tmp/bifrost_trace", file=sys.stderr)
    else:
        dt_pooled, out = timed(pooled)
    rays = float(out[1])  # exact in-run tally of the last frame
    dt_dense, _ = timed(dense)

    return {
        "pooled_rays_per_sec": rays / dt_pooled,
        "dense_rays_per_sec": rays / dt_dense,
        "rays_per_frame": rays,
        "pooled_ms": dt_pooled * 1e3,
        "dense_ms": dt_dense * 1e3,
    }


def bench_backward():
    """Backward pass: one jitted value_and_grad step w.r.t. material params
    on the CornellBox (the inverse-rendering hot loop). Rays/s uses the
    dense integrator's in-run forward ray tally (the backward re-traverses
    the same wavefront)."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample, render_sample_pooled_counted, settings_for_scene)

    scene, cam = create_cornell_box()
    W = H = 256
    settings = settings_for_scene(scene, max_bounce_count=2)
    _, rays = jax.jit(lambda n: render_sample_pooled_counted(
        scene, cam, W, H, n, settings, pool_size=65536))(jnp.uint32(1))
    rays = float(rays)
    target = render_sample(scene, cam, W, H, jnp.uint32(0), settings)

    @jax.jit
    def step(tint, n):
        def loss_fn(tint):
            mats = scene.materials._replace(tint=tint)
            img = render_sample(scene._replace(materials=mats), cam,
                                W, H, n, settings)
            return jnp.mean(jnp.square(img - target))
        return jax.value_and_grad(loss_fn)(scene.materials.tint)

    jax.block_until_ready(step(scene.materials.tint, jnp.uint32(1)))
    reps = 5
    t0 = time.perf_counter()
    out = None
    for n in range(1, reps + 1):
        out = step(scene.materials.tint, jnp.uint32(n))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return {"train_step_ms": dt * 1e3,
            "fwd_bwd_rays_per_sec": rays / dt}


def bench_smallpt():
    """Secondary: SmallPT spheres, rays/path MEASURED from the live mask
    (round-1 methodology — BENCH_r01's 27.1M and this number are directly
    comparable; BENCH_r02's 14.4M hardcoded 3.45 rays/path)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from bifrost3d_tpu.integrator import smallpt as S
    from bifrost3d_tpu.scene import smallpt_scene

    W, H = 1024, 768
    scene = smallpt_scene()

    @partial(jax.jit, static_argnames=("w", "h"))
    def live_ray_count(scene, w, h):
        from bifrost3d_tpu.sampling.hashes import (
            jenkins_hash, lcg_next, reverse_bits)
        x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.uint32)[None, :], (h, w))
        y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.uint32)[:, None], (h, w))
        acc = jnp.uint32(1)
        sx, sy = acc % 2, (acc >> jnp.uint32(1)) % 2
        index = (y * 2 + sy) * (w * 2) + x * 2 + sx
        rng = jenkins_hash(index) ^ reverse_bits(acc)
        rng, u1 = lcg_next(rng)
        rng, u2 = lcg_next(rng)
        dx, dy = S._tent_jitter(u1), S._tent_jitter(u2)
        u = ((sx.astype(jnp.float32) + 0.5 + dx) / 2
             + x.astype(jnp.float32)) / w
        v = ((sy.astype(jnp.float32) + 0.5 + dy) / 2
             + y.astype(jnp.float32)) / h
        o, d = S.smallpt_camera_ray(u, v, w, h)
        state = (o, d, jnp.ones((h, w, 3), jnp.float32),
                 jnp.zeros((h, w, 3), jnp.float32), rng,
                 jnp.ones((h, w), bool))

        def body(st, depth):
            return S._bounce(scene, st, depth), jnp.mean(
                st[5].astype(jnp.float32))

        _, counts = jax.lax.scan(body, state, jnp.arange(S.MAX_DEPTH))
        return jnp.sum(counts)

    rays_per_path = float(live_ray_count(scene, 128, 96))

    S.render_smallpt_accumulation(scene, W, H, 1).block_until_ready()
    t0 = time.perf_counter()
    buf = None
    for n in range(2, 2 + REPS):
        frame = S.render_smallpt_accumulation(scene, W, H, n)
        buf = frame if buf is None else buf + frame
    buf.block_until_ready()
    elapsed = time.perf_counter() - t0
    return {"rays_per_sec": W * H * REPS * rays_per_path / elapsed,
            "rays_per_path": rays_per_path,
            "frame_ms": elapsed / REPS * 1e3}


def bench_torus_grid():
    """589,824-triangle torus grid, 65k coherent camera rays.

    Product path = the hierarchical block-BVH Pallas kernel
    (geometry/pallas_bvh.py); the linear cluster-cull kernel is measured in
    the same run as ``linear_ms`` so the hierarchical win stays anchored."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.geometry import make_torus
    from bifrost3d_tpu.geometry.mesh import combine_meshes, transform_mesh
    from bifrost3d_tpu.geometry.pallas_bvh import (
        hierarchical_intersect, pack_hierarchical)
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
    tris = np.asarray(mesh.positions)[np.asarray(mesh.indices)]

    eye = np.asarray([0.0, 8.0, -30.0], np.float32)
    W = H = 256
    xs, ys = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H))
    d = np.stack([xs * 0.6, ys * 0.6 - 0.25, np.ones_like(xs)], -1)
    d = d.reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(np.broadcast_to(eye, d.shape).copy())
    d = jnp.asarray(d)

    def timed(f):
        # Force a scalar fetch: block_until_ready does not reliably block
        # through the axon tunnel (BASELINE.md, measurement methodology).
        float(f(o, d).t.sum())
        t0 = time.perf_counter()
        h = None
        for _ in range(REPS):
            h = f(o, d)
        float(h.t.sum())
        return (time.perf_counter() - t0) / REPS, h

    ph = jax.device_put(pack_hierarchical(tris))
    hier = jax.jit(lambda o, d: hierarchical_intersect(ph, o, d, 1e-4,
                                                       jnp.inf))
    dt, h_hier = timed(hier)

    pc = jax.device_put(pack_clustered(tris))
    clu = jax.jit(lambda o, d: clustered_intersect(pc, o, d, 1e-4, jnp.inf))
    dt_lin, h_lin = timed(clu)
    assert bool(jnp.all(h_hier.prim == h_lin.prim)), "kernel hit mismatch"

    return {"tris": int(tris.shape[0]),
            "rays_per_sec": d.shape[0] / dt, "trace_ms": dt * 1e3,
            "linear_ms": dt_lin * 1e3, "vs_linear": dt_lin / dt}


def bench_material_scene():
    """The 7-shader-ball glTF MaterialScene (≥175k tris) through the full
    pooled wavefront with exact in-run ray tally."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_material_scene
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_pooled_counted, settings_for_scene)

    scene, cam = create_material_scene()
    W = H = 512
    settings = settings_for_scene(scene, max_bounce_count=4)
    f = jax.jit(lambda n: render_sample_pooled_counted(
        scene, cam, W, H, n, settings, pool_size=65536))
    jax.block_until_ready(f(jnp.uint32(0)))
    reps = 3
    t0 = time.perf_counter()
    out = None
    for n in range(1, reps + 1):
        out = f(jnp.uint32(n))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rays = float(out[1])
    return {"tris": int(scene.tri_verts.shape[0]),
            "rays_per_sec": rays / dt, "frame_ms": dt * 1e3}


def main():
    profile = "--profile" in sys.argv
    quick = "--quick" in sys.argv
    cornell = bench_cornell(profile=profile)
    smallpt = bench_smallpt()
    result = {
        "metric": "cornell_wavefront_rays_per_sec",
        "value": round(cornell["pooled_rays_per_sec"]),
        "unit": "rays/s",
        # Speedup over the round-1 architecture (dense fixed-iteration
        # wavefront), same rays, same run — see BASELINE.md.
        "vs_baseline": round(cornell["pooled_rays_per_sec"]
                             / cornell["dense_rays_per_sec"], 2),
        "dense_rays_per_sec": round(cornell["dense_rays_per_sec"]),
        "rays_per_frame": round(cornell["rays_per_frame"]),
        "frame_ms_512": round(cornell["pooled_ms"], 2),
        "smallpt_rays_per_sec": round(smallpt["rays_per_sec"]),
        "smallpt_rays_per_path": round(smallpt["rays_per_path"], 2),
    }
    result.update({k: round(v, 2) for k, v in bench_backward().items()})
    if not quick:
        result["torus_grid_590k"] = {
            k: round(v) if k == "tris" or k == "rays_per_sec"
            else round(v, 2)
            for k, v in bench_torus_grid().items()}
        result["material_scene_gltf"] = {
            k: round(v) if k != "frame_ms" else round(v, 2)
            for k, v in bench_material_scene().items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
