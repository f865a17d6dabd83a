#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"} plus secondary keys.

PRIMARY metric: the flagship mesh path tracer on the CornellBox at 512x512
through the PRODUCT path — the Pallas mesh megakernel
(integrator/pallas_mesh.py, the whole path in one kernel; dispatched by
render_sample_fast). Timed with REPS frames folded inside ONE jitted
computation ending in a scalar fetch (the r3 roofline methodology —
BASELINE.md: through the axon tunnel, per-dispatch overhead is ~2-4 ms and
block_until_ready does not reliably block, so python-loop dispatch timing
measures the tunnel, not the chip). ``vs_baseline`` is the speedup over the
r2/r3 product path (the pooled compacting wavefront) measured the same
folded way in the same run. The ray count is EXACT, tallied in-run (live
lanes x 2 traces per iteration).

Measurement discipline (VERDICT r3 #9): every headline metric is measured
REPEATS(=3) independent times; this prints the MEDIAN and the spread
(max-min)/median so the ±20% tunnel drift stops contaminating cross-round
comparisons.

Secondary keys:
- pooled/dense rays/s: the XLA wavefront paths (pooled = r2/r3 product
  path, dense = the autodiff path), folded timing.
- dispatch_frame_ms: the megakernel frame measured with python-loop
  dispatch — the r3-comparable number (includes ~4 ms tunnel overhead per
  frame; r3's 74.4 ms pooled frame was measured this way).
- smallpt_rays_per_sec: SmallPT spheres (megakernel), measured live
  rays/path.
- train_step_ms / fwd_bwd_rays_per_sec: one jitted value_and_grad step of
  the material-parameter inverse render (dense integrator).
- torus_grid_590k: 589,824-tri torus grid through the hierarchical
  block-BVH Pallas kernel.
- material_scene_gltf: the 7-shader-ball glTF MaterialScene through the
  pooled wavefront (not megakernel-eligible: 177k tris + textures).

``--profile`` wraps the primary loop in a jax.profiler trace.
``--quick`` skips the large scenes (dev iteration).
"""

import json
import statistics
import sys
import time

import numpy as np

REPS = 10
REPEATS = 3


def _median_spread(samples):
    med = statistics.median(samples)
    spread = (max(samples) - min(samples)) / med if med else 0.0
    return med, spread


def _measure(run_once, repeats=REPEATS):
    """run_once() -> seconds. Returns (median, spread) over ``repeats``."""
    samples = [run_once() for _ in range(repeats)]
    return _median_spread(samples)


def bench_cornell(profile: bool = False):
    """Primary: mesh CornellBox 512² — megakernel + pooled + dense."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator import pallas_mesh as PM
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample, render_pixels_pooled, settings_for_scene)

    scene, cam = create_cornell_box()
    W = H = 512
    settings = settings_for_scene(scene, max_bounce_count=4)
    use_mega = (jax.default_backend() == "tpu"
                and PM.mesh_megakernel_eligible(scene, settings))

    # --- megakernel, folded reps (device-true) ---
    if use_mega:
        PM.prewarm_megakernel(scene)

        @jax.jit
        def mega_many():
            acc = jnp.float32(0)
            rays = jnp.float32(0)
            for n in range(1, REPS + 1):
                img, r = PM.render_mesh_megakernel(scene, cam, W, H,
                                                   jnp.uint32(n), settings)
                acc = acc + img.sum()
                rays = r  # per-frame tally (same every frame ± noise)
            return acc, rays

        def once_mega():
            t0 = time.perf_counter()
            _, rays = mega_many()
            once_mega.rays = float(rays)
            return (time.perf_counter() - t0) / REPS

        float(mega_many()[0])  # compile + warm
        if profile:
            import jax.profiler
            with jax.profiler.trace("/tmp/bifrost_trace"):
                once_mega()
            print("profile trace written to /tmp/bifrost_trace",
                  file=sys.stderr)
        mega_dt, mega_spread = _measure(once_mega)
        mega_rays = once_mega.rays

        # dispatch-path number (r3-comparable python-loop timing)
        def once_dispatch():
            t0 = time.perf_counter()
            out = None
            for n in range(1, REPS + 1):
                out = PM.render_mesh_megakernel(scene, cam, W, H,
                                                jnp.uint32(n), settings)
            float(out[0].sum())
            return (time.perf_counter() - t0) / REPS

        dispatch_dt, _ = _measure(once_dispatch)
    else:
        mega_dt = mega_spread = dispatch_dt = None
        mega_rays = 0.0

    # --- pooled wavefront, folded reps (3 frames per dispatch) ---
    POOL_REPS = 3

    @jax.jit
    def pooled_many():
        acc = jnp.float32(0)
        rays = jnp.float32(0)
        for n in range(1, POOL_REPS + 1):
            frame, r = render_pixels_pooled(scene, cam, W, H,
                                            jnp.uint32(n), settings, 65536)
            acc = acc + frame.sum()
            rays = r
        return acc, rays

    def once_pooled():
        t0 = time.perf_counter()
        _, rays = pooled_many()
        once_pooled.rays = float(rays)
        return (time.perf_counter() - t0) / POOL_REPS

    float(pooled_many()[0])
    pooled_dt, pooled_spread = _measure(once_pooled)
    pooled_rays = once_pooled.rays

    # --- dense wavefront (autodiff path), folded ---
    @jax.jit
    def dense_many():
        acc = jnp.float32(0)
        for n in range(1, POOL_REPS + 1):
            acc = acc + render_sample(scene, cam, W, H, jnp.uint32(n),
                                      settings).sum()
        return acc

    float(dense_many())
    def once_dense():
        t0 = time.perf_counter()
        float(dense_many())
        return (time.perf_counter() - t0) / POOL_REPS
    dense_dt, _ = _measure(once_dense)

    out = {
        "pooled_rays_per_sec": pooled_rays / pooled_dt,
        "pooled_ms": pooled_dt * 1e3,
        "pooled_spread": pooled_spread,
        "dense_rays_per_sec": pooled_rays / dense_dt,
        "dense_ms": dense_dt * 1e3,
        "rays_per_frame": pooled_rays,
    }
    if mega_dt is not None:
        out.update({
            "mega_rays_per_sec": mega_rays / mega_dt,
            "mega_ms": mega_dt * 1e3,
            "mega_spread": mega_spread,
            "mega_rays_per_frame": mega_rays,
            "dispatch_frame_ms": dispatch_dt * 1e3,
        })
    return out


def bench_backward():
    """Backward pass: one jitted value_and_grad step w.r.t. material params
    on the CornellBox (the inverse-rendering hot loop)."""
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

    STEPS = 5

    def make_steps(step_settings):
        @jax.jit
        def steps(tint):
            def loss_fn(tint, n):
                mats = scene.materials._replace(tint=tint)
                img = render_sample(scene._replace(materials=mats), cam,
                                    W, H, n, step_settings)
                return jnp.mean(jnp.square(img - target))
            acc = jnp.float32(0)
            g_sum = jnp.float32(0)
            for n in range(1, STEPS + 1):
                v, g = jax.value_and_grad(loss_fn)(tint, jnp.uint32(n))
                acc = acc + v
                g_sum = g_sum + g.sum()
            return acc + g_sum
        return steps

    def timed(steps):
        float(steps(scene.materials.tint))

        def once():
            t0 = time.perf_counter()
            float(steps(scene.materials.tint))
            return (time.perf_counter() - t0) / STEPS

        return _measure(once)

    dt, spread = timed(make_steps(settings))
    # r5: the detached-replay custom VJP (records hits forward,
    # differentiates a trace-free replay backward).
    dt_replay, replay_spread = timed(make_steps(
        settings._replace(detached_replay_vjp=True)))
    return {"train_step_ms": dt * 1e3, "train_step_spread": spread,
            "fwd_bwd_rays_per_sec": rays / dt,
            "train_step_replay_vjp_ms": dt_replay * 1e3,
            "train_step_replay_vjp_spread": replay_spread,
            "fwd_bwd_replay_rays_per_sec": rays / dt_replay}


def bench_smallpt():
    """Secondary: SmallPT spheres, rays/path MEASURED from the live mask
    (round-1 methodology — directly comparable to BENCH_r01's 27.1M)."""
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

    def once():
        t0 = time.perf_counter()
        buf = None
        for n in range(2, 2 + REPS):
            frame = S.render_smallpt_accumulation(scene, W, H, n)
            buf = frame if buf is None else buf + frame
        float(buf.sum())
        return (time.perf_counter() - t0) / REPS

    dt, spread = _measure(once)
    return {"rays_per_sec": W * H * rays_per_path / dt,
            "rays_per_path": rays_per_path,
            "frame_ms": dt * 1e3, "spread": spread}


def bench_torus_grid():
    """589,824-triangle torus grid, 65k coherent camera rays through the
    hierarchical block-BVH Pallas kernel vs the linear cluster-cull scan."""
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
        float(f(o, d).t.sum())

        def once():
            t0 = time.perf_counter()
            h = None
            for _ in range(REPS):
                h = f(o, d)
            float(h.t.sum())
            return (time.perf_counter() - t0) / REPS

        dt, spread = _measure(once)
        return dt, spread, f(o, d)

    ph = jax.device_put(pack_hierarchical(tris))
    hier = jax.jit(lambda o, d: hierarchical_intersect(ph, o, d, 1e-4,
                                                       jnp.inf))
    dt, spread, h_hier = timed(hier)

    pc = jax.device_put(pack_clustered(tris))
    clu = jax.jit(lambda o, d: clustered_intersect(pc, o, d, 1e-4, jnp.inf))
    dt_lin, _, h_lin = timed(clu)
    assert bool(jnp.all(h_hier.prim == h_lin.prim)), "kernel hit mismatch"

    return {"tris": int(tris.shape[0]),
            "rays_per_sec": d.shape[0] / dt, "trace_ms": dt * 1e3,
            "spread": spread,
            "linear_ms": dt_lin * 1e3, "vs_linear": dt_lin / dt}


def bench_megakernel_class():
    """The r5 megakernel scene-class widening, measured: scenes that fell
    off the 10x cliff in r4 (textures, cutouts, env maps, coat, spots)
    now dispatch through the megakernel. Each row: megakernel frame vs
    the pooled wavefront on the same scene, same folded timing."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps import scenes as S
    from bifrost3d_tpu.integrator import pallas_mesh as PM
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_pooled_counted, settings_for_scene)

    out = {}
    if jax.default_backend() != "tpu":
        return out
    cases = [("opacity", S.create_opacity_scene),
             ("sphere_env", S.create_sphere_scene)]
    W = H = 512
    for name, ctor in cases:
        scene, cam = ctor()
        settings = settings_for_scene(scene, max_bounce_count=4)
        if not PM.mesh_megakernel_eligible(scene, settings):
            out[name] = {"eligible": False}
            continue
        PM.prewarm_megakernel(scene)

        @jax.jit
        def mega_many():
            acc = jnp.float32(0)
            rays = jnp.float32(0)
            for n in range(1, REPS + 1):
                img, r = PM.render_mesh_megakernel(
                    scene, cam, W, H, jnp.uint32(n), settings)
                acc = acc + img.sum()
                rays = r
            return acc, rays

        state = {}

        def once_mega():
            t0 = time.perf_counter()
            acc, rays = mega_many()
            float(acc)
            state["rays"] = float(rays)
            return (time.perf_counter() - t0) / REPS

        float(mega_many()[0])
        dt, spread = _measure(once_mega)

        f = jax.jit(lambda n: render_sample_pooled_counted(
            scene, cam, W, H, n, settings, 65536))
        jax.block_until_ready(f(jnp.uint32(0)))

        def once_pool():
            t0 = time.perf_counter()
            img, r = f(jnp.uint32(1))
            float(img.sum())
            state["pool_rays"] = float(r)
            return time.perf_counter() - t0

        dt_pool, _ = _measure(once_pool)
        out[name] = {
            "eligible": True,
            "mega_ms": dt * 1e3, "mega_rays_per_sec": state["rays"] / dt,
            "pooled_ms": dt_pool * 1e3,
            "pooled_rays_per_sec": state["pool_rays"] / dt_pool,
            "speedup": dt_pool / dt, "spread": spread,
        }
    return out


def bench_hier_bridge():
    """The r5 1k→262k triangle bridge: mid-size scenes through the
    hierarchical DMA megakernel (whole path in one kernel, cluster-BVH
    walk per pixel tile) vs the pooled wavefront, same scenes, same
    folded timing. These sizes fell off the 10x megakernel→wavefront
    cliff before r5 (MAX_TRIS was 1024)."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import _trs
    from bifrost3d_tpu.geometry.creation import (make_box, make_plane,
                                                 make_sphere, make_torus)
    from bifrost3d_tpu.integrator import pallas_mesh as PM
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_pooled_counted, settings_for_scene)
    from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
    from bifrost3d_tpu.scene.camera import perspective_camera
    from bifrost3d_tpu.scene.materials import MaterialArray, dielectric, metal
    from bifrost3d_tpu.scene.render_scene import build_render_scene

    out = {}
    if jax.default_backend() != "tpu":
        return out

    def build(slices, stacks, extra_tori):
        mats = MaterialArray.build([
            dielectric((0.7, 0.7, 0.7), 0.6),
            metal((0.95, 0.64, 0.54), 0.3),
            dielectric((0.2, 0.4, 0.8), 0.2)])
        instances = [
            (make_plane(size=4.0), 0, _trs((0, -0.5, 0))),
            (make_sphere(slices=slices, stacks=stacks), 1,
             _trs((-0.5, 0.0, 0.2))),
            (make_sphere(slices=slices, stacks=stacks), 2,
             _trs((0.6, -0.1, -0.2))),
            (make_box(size=0.5), 0, _trs((0.0, -0.3, -0.8)))]
        for i in range(extra_tori):
            instances.append((make_torus(0.35, 0.12, 48, 24), 1,
                              _trs((-1.2 + 0.8 * i, 0.3, -0.6))))
        lights = LightArray.build([
            {"kind": LIGHT_SPHERE, "position": (0.0, 1.6, 0.5),
             "radius": 0.2, "power": (40.0,) * 3}])
        scene = build_render_scene(instances, mats, lights)
        return scene, perspective_camera((0.0, 0.6, 2.4), (0.0, -0.1, 0.0))

    W = H = 512
    for args in [(40, 20, 0), (64, 40, 2), (128, 80, 4)]:
        scene, cam = build(*args)
        tris = int(scene.tri_verts.shape[0])
        settings = settings_for_scene(scene, max_bounce_count=4)
        if not PM.mesh_megakernel_eligible(scene, settings):
            out[f"{tris}_tris"] = {"eligible": False}
            continue
        PM.prewarm_megakernel(scene)

        @jax.jit
        def mega_many():
            acc = jnp.float32(0)
            rays = jnp.float32(0)
            for n in range(1, REPS + 1):
                img, r = PM.render_mesh_megakernel(
                    scene, cam, W, H, jnp.uint32(n), settings)
                acc = acc + img.sum()
                rays = r
            return acc, rays

        state = {}

        def once_mega():
            t0 = time.perf_counter()
            acc, rays = mega_many()
            float(acc)
            state["rays"] = float(rays)
            return (time.perf_counter() - t0) / REPS

        float(mega_many()[0])
        dt, spread = _measure(once_mega)

        POOL_REPS = 3

        @jax.jit
        def pool_many():
            acc = jnp.float32(0)
            rays = jnp.float32(0)
            for n in range(1, POOL_REPS + 1):
                img, r = render_sample_pooled_counted(
                    scene, cam, W, H, jnp.uint32(n), settings, 65536)
                acc = acc + img.sum()
                rays = r
            return acc, rays

        float(pool_many()[0])

        def once_pool():
            t0 = time.perf_counter()
            acc, r = pool_many()
            float(acc)
            state["pool_rays"] = float(r)
            return (time.perf_counter() - t0) / POOL_REPS

        dt_pool, _ = _measure(once_pool)
        out[f"{tris}_tris"] = {
            "eligible": True, "tris": tris,
            "mega_ms": dt * 1e3, "mega_rays_per_sec": state["rays"] / dt,
            "pooled_ms": dt_pool * 1e3,
            "pooled_rays_per_sec": state["pool_rays"] / dt_pool,
            "speedup": dt_pool / dt, "spread": spread}
    return out


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
    state = {}

    def once():
        reps = 2
        t0 = time.perf_counter()
        out = None
        for n in range(1, reps + 1):
            out = f(jnp.uint32(n))
        float(out[0].sum())
        state["rays"] = float(out[1])
        return (time.perf_counter() - t0) / reps

    dt, spread = _measure(once)
    return {"tris": int(scene.tri_verts.shape[0]),
            "rays_per_sec": state["rays"] / dt, "frame_ms": dt * 1e3,
            "spread": spread}


def main():
    profile = "--profile" in sys.argv
    quick = "--quick" in sys.argv
    cornell = bench_cornell(profile=profile)
    smallpt = bench_smallpt()
    if "mega_rays_per_sec" in cornell:
        primary = cornell["mega_rays_per_sec"]
        vs = cornell["mega_rays_per_sec"] / cornell["pooled_rays_per_sec"]
        metric = "cornell_megakernel_rays_per_sec"
    else:
        primary = cornell["pooled_rays_per_sec"]
        vs = primary / cornell["dense_rays_per_sec"]
        metric = "cornell_wavefront_rays_per_sec"
    result = {
        "metric": metric,
        "value": round(primary),
        "unit": "rays/s",
        # Speedup of the current product path over the r2/r3 product path
        # (pooled wavefront), same rays, same run, same folded timing.
        "vs_baseline": round(vs, 2),
        "cornell": {k: round(v, 3) if isinstance(v, float) else v
                    for k, v in cornell.items()},
        "smallpt_rays_per_sec": round(smallpt["rays_per_sec"]),
        "smallpt_rays_per_path": round(smallpt["rays_per_path"], 2),
        "smallpt_spread": round(smallpt["spread"], 3),
    }
    result.update({k: round(v, 3) for k, v in bench_backward().items()})
    if not quick:
        result["megakernel_scene_class"] = {
            name: {k: round(v, 3) if isinstance(v, float) else v
                   for k, v in row.items()}
            for name, row in bench_megakernel_class().items()}
    if not quick:
        result["hier_bridge"] = {
            name: {k: round(v, 3) if isinstance(v, float) else v
                   for k, v in row.items()}
            for name, row in bench_hier_bridge().items()}
    if not quick:
        result["torus_grid_590k"] = {
            k: round(v) if k in ("tris", "rays_per_sec") else round(v, 3)
            for k, v in bench_torus_grid().items()}
        result["material_scene_gltf"] = {
            k: round(v) if k in ("tris", "rays_per_sec") else round(v, 3)
            for k, v in bench_material_scene().items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
