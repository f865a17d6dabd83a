#!/usr/bin/env python
"""Speed-of-light / roofline analysis for the hot kernels (BASELINE.md §SOL).

Methodology (tunneled-TPU-safe):
- The axon tunnel adds a large per-dispatch+fetch floor (~20 ms) and
  ``block_until_ready`` does not reliably block until bytes land on the
  host, so every measurement (a) folds repetitions inside ONE jitted
  computation where possible, (b) is forced by fetching a scalar
  reduction to the host, and (c) subtracts the measured dispatch floor.
- Chip ceilings are measured empirically (HBM copy loop, bf16 matmul
  loop) and cross-checked against the analytic VPU bound
  8 sublanes x 128 lanes x 2 FLOP(FMA) x clock.
- The Möller-Trumbore unit of work is ~53 VPU f32 ops per ray-triangle
  test (counted from pallas_intersect._mt_block), so
  tests/s x 53 = achieved VPU FLOP/s for the trace kernels.

Prints a table + writes ROOFLINE_r03.json. Run on the TPU chip.
"""

import json
import sys
import time

import numpy as np

MT_OPS = 53          # f32 VPU ops per ray-triangle test (_mt_block)
VPU_CLOCK_GHZ = 0.94  # TPU v5e core clock (analytic cross-check only)
VPU_ANALYTIC_TFLOPS = 8 * 128 * 2 * VPU_CLOCK_GHZ / 1e3  # ≈1.93 f32


def _force(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _bench(jitted, args, inner, reps=3):
    """Min over reps of (one dispatch + forced fetch) / inner."""
    _force(jitted(*args))   # warm + compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best / inner


def measure_floor():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2.0)
    return _bench(f, (jnp.ones((8, 128)),), 1, reps=5)


def measure_hbm(floor):
    import jax
    import jax.numpy as jnp
    N = 128 * 1024 * 1024  # 512 MB f32
    INNER = 50

    @jax.jit
    def copy_loop(x):
        return jax.lax.fori_loop(0, INNER, lambda i, c: c * 1.0000001, x)

    x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    dt = (_bench(copy_loop, (x,), 1) - floor) / INNER
    return 2 * N * 4 / dt / 1e9  # GB/s (read + write)


def measure_mxu(floor):
    import jax
    import jax.numpy as jnp
    n, INNER = 4096, 50

    @jax.jit
    def mm_loop(a):
        return jax.lax.fori_loop(
            0, INNER, lambda i, c: (a @ c) * jnp.bfloat16(0.5), a)

    a = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    dt = (_bench(mm_loop, (a,), 1) - floor) / INNER
    return 2 * n ** 3 / dt / 1e12  # TFLOP/s


def _soup_rays(n_rays, seed=2):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def measure_mt_dense(floor, n_tris=2176, n_rays=1024 * 1024):
    """Dense streaming kernel: achieved ray-tri tests/s (the VPU ceiling
    as far as this workload is concerned)."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.geometry.pallas_intersect import (
        pack_triangles, pallas_intersect)

    rng = np.random.default_rng(3)
    c = rng.uniform(-1, 1, (n_tris, 1, 3))
    tri = (c + rng.uniform(-0.05, 0.05, (n_tris, 3, 3))).astype(np.float32)
    comp, t = pack_triangles(tri)
    comp = jax.device_put(comp)
    o, d = _soup_rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    f = jax.jit(lambda o, d: pallas_intersect(comp, t, o, d, 1e-4, jnp.inf))
    dt = _bench(f, (o, d), 1) - floor
    tests = n_rays * ((n_tris + 511) // 512) * 512  # padded block work
    return tests / dt  # tests/s


def measure_hier(floor):
    """Hierarchical kernel on the 590k-tri torus grid, coherent rays."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.geometry import make_torus
    from bifrost3d_tpu.geometry.mesh import combine_meshes, transform_mesh
    from bifrost3d_tpu.geometry.pallas_bvh import (
        hierarchical_intersect, pack_hierarchical)

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
    W = H = 512
    xs, ys = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H))
    d = np.stack([xs * 0.6, ys * 0.6 - 0.25, np.ones_like(xs)], -1)
    d = d.reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    import jax.numpy as jnp
    o = jnp.asarray(np.broadcast_to(eye, d.shape).copy())
    d = jnp.asarray(d)
    ph = jax.device_put(pack_hierarchical(tris))
    f = jax.jit(lambda o, d: hierarchical_intersect(ph, o, d, 1e-4, jnp.inf))
    dt = _bench(f, (o, d), 1) - floor
    return {"tris": int(tris.shape[0]), "rays": int(d.shape[0]),
            "rays_per_sec": d.shape[0] / dt, "trace_ms": dt * 1e3}


def measure_cornell(floor):
    """Flagship frame: pooled wavefront on the mesh CornellBox."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_pooled_counted, settings_for_scene)

    scene, cam = create_cornell_box()
    W = H = 512
    settings = settings_for_scene(scene, max_bounce_count=4)
    f = jax.jit(lambda n: render_sample_pooled_counted(
        scene, cam, W, H, n, settings, pool_size=65536))
    _force(f(jnp.uint32(0))[0])
    best, rays = np.inf, 0.0
    for n in range(1, 4):
        t0 = time.perf_counter()
        out = f(jnp.uint32(n))
        _force(out[0])
        dt = time.perf_counter() - t0
        if dt < best:
            best, rays = dt, float(out[1])
    n_tris = int(scene.tri_verts.shape[0])
    return {"tris": n_tris, "frame_ms": (best - floor) * 1e3,
            "rays_per_frame": rays,
            "rays_per_sec": rays / (best - floor)}


def measure_cornell_breakdown(floor):
    """Additive frame attribution by ablation: full − (NEE off) = NEE+shadow
    cost; (bounce 1) vs (bounce 4) = per-bounce marginal. The ablated
    estimators render different images — this measures COST, not output."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_pooled_counted, settings_for_scene)

    scene, cam = create_cornell_box()
    W = H = 512

    def frame_ms(**over):
        settings = settings_for_scene(scene, max_bounce_count=4)._replace(
            **over)
        f = jax.jit(lambda n: render_sample_pooled_counted(
            scene, cam, W, H, n, settings, pool_size=65536))
        _force(f(jnp.uint32(0))[0])
        best = np.inf
        for n in range(1, 4):
            t0 = time.perf_counter()
            _force(f(jnp.uint32(n))[0])
            best = min(best, time.perf_counter() - t0)
        return (best - floor) * 1e3

    full = frame_ms()
    no_nee = frame_ms(next_event_sample_count=0)
    one_bounce = frame_ms(max_bounce_count=1)
    return {"full_ms": full, "nee_off_ms": no_nee,
            "nee_cost_ms": full - no_nee,
            "one_bounce_ms": one_bounce,
            "per_extra_bounce_ms": (full - one_bounce) / 3}


def main():
    floor = measure_floor()
    hbm = measure_hbm(floor)
    mxu = measure_mxu(floor)
    mt = measure_mt_dense(floor)
    mt_tf = mt * MT_OPS / 1e12
    hier = measure_hier(floor)
    cornell = measure_cornell(floor)

    # Trace-only speed-of-light for the Cornell frame: if every counted ray
    # (1 trace call each; shadow marches are counted as rays too) paid only
    # the dense-streaming trace cost at the measured tests/s ceiling.
    blocks = (cornell["tris"] + 511) // 512
    trace_sol_rays = mt / (blocks * 512)
    cornell_frac = cornell["rays_per_sec"] / trace_sol_rays

    out = {
        "dispatch_floor_ms": floor * 1e3,
        "ceilings": {
            "hbm_gbps": hbm,
            "mxu_bf16_tflops": mxu,
            "vpu_f32_analytic_tflops": VPU_ANALYTIC_TFLOPS,
        },
        "mt_dense": {
            "tests_per_sec": mt,
            "achieved_vpu_tflops": mt_tf,
            "pct_of_vpu_analytic": 100 * mt_tf / VPU_ANALYTIC_TFLOPS,
        },
        "hier_590k": hier,
        "cornell_pooled": dict(
            cornell,
            trace_sol_rays_per_sec=trace_sol_rays,
            pct_of_trace_sol=100 * cornell_frac,
        ),
        "cornell_breakdown": measure_cornell_breakdown(floor),
    }
    path = "ROOFLINE_r03.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"\nwritten to {path}")


if __name__ == "__main__":
    main()
