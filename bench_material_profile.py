"""Stage-level profile of ONE pooled-wavefront iteration on the glTF
MaterialScene — the measurement VERDICT r4 #1 demanded before attacking
the 591 ms frame ("you cannot fix what you haven't measured").

Method: capture a representative pool state (65,536 lanes, after k sorted
steps so bounces/hit kinds are mixed like mid-frame), then time each stage
of the step body in isolation — REPS folded inside one jitted fori_loop
whose carry feeds the next rep (defeats CSE/DCE), scalar fetch at the end,
dispatch floor subtracted, median of 3.

Stages (mirroring _wavefront_step + the pooled loop body):
  sort             Morton+octant key, argsort, pool gather
  trace            closest-hit (hierarchical BVH kernel, live prefix)
  shadow           any-hit shadow trace for RIS-selected NEE directions
  attr_fetch       triangle attribute gathers + barycentric einsums + material one-hot gather
  textures         _surface_material_params (trilinear mips on the floor texture)
  shading_nee      _create_shading + RIS(N) NEE (light eval, no shadow trace)
  bsdf_sample      _shading_sample + direction/throughput algebra
  rng              the two path_rng_4d evaluations per iteration
  refill           finished-lane scatter, cumsum compaction, camera respawn, merge
  full_step        _wavefront_step end to end (everything but sort/refill)
  full_body        sort + full_step + refill = one loop iteration

Writes ROOFLINE_r05.json (section "material_scene_stage_profile").
"""

import json
import time

import numpy as np

REPS = 8


def _force(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _median_spread(samples):
    med = float(np.median(samples))
    spread = (max(samples) - min(samples)) / max(med, 1e-12)
    return med, spread


def _bench(fn, floor, reps=3):
    """fn: jitted nullary -> scalar-reducible; returns (seconds_per_rep,
    spread) with REPS folded inside fn."""
    _force(fn())  # compile + warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn())
        samples.append((time.perf_counter() - t0 - floor) / REPS)
    return _median_spread(samples)


def measure_floor():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8, 128))
    _force(f(x))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _force(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def build_state(k_steps=2, pool=65536, W=512, H=512):
    """Scene + a representative pool state after k sorted steps."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_material_scene
    from bifrost3d_tpu.integrator import path_tracer as PT

    scene, cam = create_material_scene()
    settings = PT.settings_for_scene(scene, max_bounce_count=4)
    accumulation = jnp.uint32(1)
    # STRIDED pixels: the first 65536 flat pixels are all sky (the image's
    # top quarter) and die in one step; a stride-4 sample covers the whole
    # frame so the captured live fraction matches mid-frame reality.
    pixel_idx = jnp.arange(pool, dtype=jnp.int32) * (W * H // pool)
    pixel_end = jnp.int32(W * H)

    @jax.jit
    def advance():
        state = PT._make_camera_lanes(cam, pixel_idx, W, H, accumulation,
                                      pixel_end)
        step = lambda s, live: PT._wavefront_step(
            scene, settings, accumulation, s,
            pixel_angle=PT._camera_pixel_angle(cam, H), live_count=live)
        for _ in range(k_steps):
            state, _ = _sorted(scene, state, pixel_idx)
            live = jnp.sum(state.active.astype(jnp.int32))
            state = step(state, live)
        state, _ = _sorted(scene, state, pixel_idx)
        return state

    state = jax.block_until_ready(advance())
    return scene, cam, settings, state, accumulation, pixel_idx, pixel_end


def _sorted(scene, st, pix):
    """The pooled loop's Morton+octant sort (path_tracer body copy)."""
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.math.morton import morton_encode_3d
    d = st.direction
    lo = scene.bvh.node_min[0]
    hi = scene.bvh.node_max[0]
    scale = 63.0 / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((st.origin - lo) * scale, 0.0, 63.0).astype(jnp.uint32)
    m = morton_encode_3d(q[:, 0], q[:, 1], q[:, 2])
    octant = ((d[:, 0] < 0).astype(jnp.uint32) * 4
              + (d[:, 1] < 0).astype(jnp.uint32) * 2
              + (d[:, 2] < 0).astype(jnp.uint32))
    key = ((m << jnp.uint32(3)) | octant).astype(jnp.int32)
    key = key + jnp.where(st.active, 0, 1 << 22)
    order = jnp.argsort(key, stable=True)
    return (jax.tree.map(lambda f: f[order], st), pix[order])


def main():
    import jax
    import jax.numpy as jnp
    from bifrost3d_tpu.geometry.traverse import (
        intersect_scene, intersect_scene_any)
    from bifrost3d_tpu.integrator import path_tracer as PT
    from bifrost3d_tpu.sampling.sobol import Dimension, path_rng_4d

    floor = measure_floor()
    print(f"dispatch floor {floor*1e3:.2f} ms")
    scene, cam, settings, state, accumulation, pixel_idx, pixel_end = \
        build_state()
    live = jnp.sum(state.active.astype(jnp.int32))
    print("live lanes:", int(live), "/", state.active.shape[0])
    pixel_angle = PT._camera_pixel_angle(cam, 512)
    eps = scene.scene_epsilon

    # Shared precomputation for the shade-stage isolations (one real hit).
    hit0 = jax.block_until_ready(jax.jit(lambda: intersect_scene(
        scene.bvh, scene.tri_verts, state.origin, state.direction,
        t_min=eps, tri_components=scene.tri_components,
        tri_clustered=scene.tri_clustered, live_count=live))())
    prim0 = jnp.maximum(hit0.prim, 0)
    v0, n0, uv0, tr0, mat_idx0 = PT._fetch_tri_attributes(scene, prim0)
    bary0 = jnp.stack([1.0 - hit0.u - hit0.v, hit0.u, hit0.v], axis=-1)
    position0 = jnp.einsum("rk,rkc->rc", bary0, v0)
    texcoord0 = jnp.einsum("rk,rkc->rc", bary0, uv0)
    tr_scale0 = jnp.einsum("rk,rkc->rc", bary0, tr0)
    sn0 = PT.normalize(jnp.einsum("rk,rkc->rc", bary0, n0))
    gn0 = PT.normalize(jnp.cross(v0[:, 1] - v0[:, 0], v0[:, 2] - v0[:, 0]))
    mats_lane0 = jax.block_until_ready(
        jax.jit(lambda: scene.materials.gather(mat_idx0))())
    wo0 = PT.to_local(-state.direction, sn0)
    cos_o0 = wo0[..., 2]
    tex0 = jax.jit(lambda: PT._surface_material_params(
        scene, mats_lane0, texcoord0, tr_scale0,
        footprint_uv=jnp.full(cos_o0.shape, 1e-3),
        trilinear=settings.trilinear_textures))()
    bundle0 = jax.jit(lambda: PT._create_shading(
        mats_lane0, cos_o0, jnp.zeros_like(cos_o0),
        settings.shading_models_present, tint=tex0[0], roughness=tex0[1],
        metallic=tex0[2],
        thin_walled=(mats_lane0.flags & 1) != 0))()
    nee0 = jax.block_until_ready(jax.jit(lambda: PT._reestimated_light_samples(
        scene, bundle0, position0, wo0, sn0,
        path_rng_4d(accumulation, state.pixel_hash, jnp.uint32(7)),
        settings))())
    l_dir0, l_dist0 = nee0[0], nee0[1]

    def fold(stage):
        """REPS-fold `stage(i, carry) -> carry` inside one jit."""
        @jax.jit
        def run():
            def body(i, c):
                return stage(jnp.uint32(i), c)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        return run

    stages = {}

    # -- sort --
    def s_sort(i, c):
        st = state._replace(origin=state.origin + c * 1e-20)
        st2, _ = _sorted(scene, st, pixel_idx)
        return c + jnp.sum(st2.origin[0]) * 1e-20
    stages["sort"] = fold(s_sort)

    # -- trace (closest hit) --
    def s_trace(i, c):
        h = intersect_scene(
            scene.bvh, scene.tri_verts, state.origin + c * 1e-20,
            state.direction, t_min=eps,
            tri_components=scene.tri_components,
            tri_clustered=scene.tri_clustered, live_count=live)
        return c + jnp.sum(jnp.where(h.mask, h.t, 0.0)) * 1e-20
    stages["trace"] = fold(s_trace)

    # -- shadow (any hit) --
    def s_shadow(i, c):
        occ = intersect_scene_any(
            scene.bvh, scene.tri_verts, position0 + c * 1e-20, l_dir0,
            t_min=eps, t_max=l_dist0 * (1.0 - 1e-4),
            tri_components=scene.tri_components,
            tri_clustered=scene.tri_clustered, live_count=live)
        return c + jnp.sum(occ.astype(jnp.float32)) * 1e-20
    stages["shadow"] = fold(s_shadow)

    # -- attribute fetch --
    def s_attr(i, c):
        prim = jnp.minimum(prim0 + i.astype(jnp.int32) * 0, prim0)
        v, n, uv, tr, mat_idx = PT._fetch_tri_attributes(scene, prim)
        bary = jnp.stack([1.0 - hit0.u - hit0.v + c * 1e-20,
                          hit0.u, hit0.v], axis=-1)
        pos = jnp.einsum("rk,rkc->rc", bary, v)
        snl = jnp.einsum("rk,rkc->rc", bary, n)
        uvl = jnp.einsum("rk,rkc->rc", bary, uv)
        trl = jnp.einsum("rk,rkc->rc", bary, tr)
        ml = scene.materials.gather(mat_idx)
        return c + (jnp.sum(pos) + jnp.sum(snl) + jnp.sum(uvl)
                    + jnp.sum(trl) + jnp.sum(ml.tint)) * 1e-20
    stages["attr_fetch"] = fold(s_attr)

    # -- textures --
    def s_tex(i, c):
        t = PT._surface_material_params(
            scene, mats_lane0, texcoord0 + c * 1e-20, tr_scale0,
            footprint_uv=jnp.full(cos_o0.shape, 1e-3),
            trilinear=settings.trilinear_textures)
        return c + sum(jnp.sum(x) for x in t) * 1e-20

    stages["textures"] = fold(s_tex)

    # -- shading create + RIS NEE (no shadow trace) --
    def s_nee(i, c):
        b = PT._create_shading(
            mats_lane0, cos_o0 + c * 1e-20, jnp.zeros_like(cos_o0),
            settings.shading_models_present, tint=tex0[0],
            roughness=tex0[1], metallic=tex0[2],
            thin_walled=(mats_lane0.flags & 1) != 0)
        u = path_rng_4d(accumulation + i, state.pixel_hash, jnp.uint32(7))
        d, dist, rad, valid = PT._reestimated_light_samples(
            scene, b, position0, wo0, sn0, u, settings)
        return c + jnp.sum(rad) * 1e-20
    stages["shading_nee"] = fold(s_nee)

    # -- BSDF sample --
    def s_bsdf(i, c):
        u = path_rng_4d(accumulation + i, state.pixel_hash, jnp.uint32(11))
        s = PT._shading_sample(bundle0, wo0 + c * 1e-20, u[..., :3])
        nd = PT.to_world(s.direction, sn0)
        w = jnp.abs(s.direction[..., 2]) / jnp.maximum(s.pdf, 1e-12)
        t = state.throughput * s.reflectance * w[..., None]
        return c + (jnp.sum(nd) + jnp.sum(t)) * 1e-20
    stages["bsdf_sample"] = fold(s_bsdf)

    # -- RNG --
    def s_rng(i, c):
        u1 = path_rng_4d(accumulation + i, state.pixel_hash, jnp.uint32(7))
        u2 = path_rng_4d(accumulation + i, state.pixel_hash, jnp.uint32(3))
        return c + (jnp.sum(u1) + jnp.sum(u2)) * 1e-20
    stages["rng"] = fold(s_rng)

    # -- refill / scatter / compaction --
    accum0 = jnp.zeros((512 * 512, 3), jnp.float32)

    def s_refill(i, c):
        done = ~state.active
        accum = accum0.at[jnp.clip(pixel_idx, 0, 512 * 512 - 1)].add(
            jnp.where(done[..., None], state.radiance + c * 1e-20, 0.0))
        slot = jnp.cumsum(done.astype(jnp.int32)) - 1
        new_idx = jnp.int32(65536) + slot
        refill = done & (new_idx < pixel_end)
        pix = jnp.where(refill, new_idx, pixel_idx)
        fresh = PT._make_camera_lanes(cam, pix, 512, 512, accumulation + i,
                                      pixel_end)
        merged = PT._PathState(*(
            jnp.where(refill.reshape(refill.shape + (1,) * (f.ndim - 1)),
                      f, s)
            for f, s in zip(fresh, state)))
        return c + (jnp.sum(accum) + jnp.sum(merged.origin)) * 1e-20
    stages["refill"] = fold(s_refill)

    # -- full step --
    def s_step(i, c):
        st = state._replace(origin=state.origin + c * 1e-20)
        out = PT._wavefront_step(scene, settings, accumulation + i, st,
                                 pixel_angle=pixel_angle, live_count=live)
        return c + jnp.sum(out.radiance) * 1e-20
    stages["full_step"] = fold(s_step)

    # -- full body (sort + step + refill) --
    def s_body(i, c):
        st = state._replace(origin=state.origin + c * 1e-20)
        st, pix = _sorted(scene, st, pixel_idx)
        lv = jnp.sum(st.active.astype(jnp.int32))
        out = PT._wavefront_step(scene, settings, accumulation + i, st,
                                 pixel_angle=pixel_angle, live_count=lv)
        done = ~out.active
        accum = accum0.at[jnp.clip(pix, 0, 512 * 512 - 1)].add(
            jnp.where(done[..., None], out.radiance, 0.0))
        return c + jnp.sum(accum) * 1e-20
    stages["full_body"] = fold(s_body)

    # -- ablated full steps: attribute the fixed cost the isolations miss --
    def step_with(settings_over, scene_over=None):
        sc = scene_over if scene_over is not None else scene
        def s(i, c):
            st = state._replace(origin=state.origin + c * 1e-20)
            out = PT._wavefront_step(sc, settings_over, accumulation + i, st,
                                     pixel_angle=pixel_angle,
                                     live_count=live)
            return c + jnp.sum(out.radiance) * 1e-20
        return fold(s)

    stages["step_nee_off"] = step_with(
        settings._replace(next_event_sample_count=0))
    stages["step_nee1"] = step_with(
        settings._replace(next_event_sample_count=1))
    # Texture-free scene variant: all texture bindings cleared.
    mats_plain = scene.materials._replace(
        tint_roughness_texture=jnp.full_like(
            scene.materials.tint_roughness_texture, -1),
        metallic_texture=jnp.full_like(scene.materials.metallic_texture, -1),
        coverage_texture=jnp.full_like(scene.materials.coverage_texture, -1))
    scene_notex = scene._replace(materials=mats_plain)
    stages["step_no_textures"] = step_with(
        settings._replace(trilinear_textures=False), scene_notex)
    stages["step_bilinear"] = step_with(
        settings._replace(trilinear_textures=False))

    results = {}
    for name, fn in stages.items():
        ms, spread = _bench(fn, floor)
        results[name] = {"ms": ms * 1e3, "spread": round(spread, 3)}
        print(f"{name:16s} {ms*1e3:8.2f} ms  (spread {spread:.3f})")

    # Frame context: full render with iteration count.
    f = jax.jit(lambda n: PT.render_pixels_pooled(
        scene, cam, 512, 512, n, settings, 65536, with_iters=True))
    out = jax.block_until_ready(f(jnp.uint32(1)))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(jnp.uint32(2)))
    frame_s = time.perf_counter() - t0 - floor
    iters = int(out[2])
    rays = float(out[1])
    print(f"frame {frame_s*1e3:.1f} ms, {iters} iterations, "
          f"{rays/frame_s/1e6:.2f} M rays/s")

    profile = {
        "config": "glTF MaterialScene 512x512 pool 65536, representative "
                  "state after 2 sorted steps, live lanes "
                  f"{int(live)}/65536",
        "stages_ms_per_iteration": results,
        "frame_ms": frame_s * 1e3,
        "iterations": iters,
        "rays": rays,
        "rays_per_sec": rays / frame_s,
        "implied_body_ms_x_iters": results["full_body"]["ms"] * iters,
    }

    try:
        with open("ROOFLINE_r05.json") as fh:
            doc = json.load(fh)
    except FileNotFoundError:
        doc = {"date": "2026-08-21",
               "hardware": "TPU v5 lite (1 chip via axon tunnel)"}
    doc["material_scene_stage_profile"] = profile
    with open("ROOFLINE_r05.json", "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(profile, indent=2))


if __name__ == "__main__":
    main()
