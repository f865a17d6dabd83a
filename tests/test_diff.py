"""Differentiable-rendering tests (BASELINE.md pixel-gradient parity):
gradients vs finite differences, and a small inverse-rendering recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.diff import image_l2_loss, optimize_materials
from bifrost3d_tpu.geometry import make_plane, make_sphere
from bifrost3d_tpu.integrator.path_tracer import RenderSettings, render_sample
from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
from bifrost3d_tpu.scene.render_scene import build_render_scene

W, H = 16, 12
# Only DefaultShading compiles (the test scene is a dielectric): compiling
# all three shading models through grad dominated suite wall time. One RIS
# candidate: the NEE estimator is unchanged (RIS(1) = single-light NEE) and
# the Python-unrolled candidate loop stops tripling the compiled graph —
# RIS(3) semantics are covered by test_path_tracer.
SETTINGS = RenderSettings(max_bounce_count=2, shading_models_present=(0,),
                          next_event_sample_count=1)


def make_scene(tint=(0.6, 0.4, 0.2), roughness=0.6):
    mats = MaterialArray.build([dielectric(tint, roughness)])
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0, 2.0, 1.0), "radius": 0.2,
         "power": (30, 30, 30)}])
    return build_render_scene(
        [(make_sphere(radius=0.5, slices=24, stacks=12), 0, None)],
        mats, lights, environment_map=np.full((16, 32, 3), 0.2, np.float32))


@pytest.fixture(scope="module")
def camera():
    return perspective_camera(eye=(0, 0.5, 2.2), target=(0, 0, 0))


class TestGradients:
    def test_tint_gradient_matches_finite_differences(self, camera):
        """One jitted value_and_grad serves the analytic gradient AND both
        finite-difference evaluations (its forward value) — a single XLA
        compilation instead of three."""
        scene = make_scene()
        target = jnp.zeros((H, W, 3))

        @jax.jit
        @jax.value_and_grad
        def loss_at(tint_r):
            mats = scene.materials._replace(
                tint=scene.materials.tint.at[0, 0].set(tint_r))
            s = scene._replace(materials=mats)
            img = render_sample(s, camera, W, H, 0, SETTINGS)
            return image_l2_loss(img, target)

        _, analytic = loss_at(0.6)
        eps = 1e-2
        fd = (float(loss_at(0.6 + eps)[0])
              - float(loss_at(0.6 - eps)[0])) / (2 * eps)
        # Same RNG for every evaluation ⇒ the FD is low-noise; detached
        # sampling leaves a small bias vs the full derivative.
        np.testing.assert_allclose(float(analytic), fd, rtol=0.08)

    def test_light_power_gradient_positive(self, camera):
        """Brighter light → brighter image; d(mean)/d(power) > 0 and
        matches finite differences."""
        scene = make_scene()

        @jax.jit
        @jax.value_and_grad
        def mean_image(power_scale):
            lights = scene.lights._replace(power=scene.lights.power * power_scale)
            s = scene._replace(lights=lights)
            return jnp.mean(render_sample(s, camera, W, H, 0, SETTINGS))

        _, g = mean_image(1.0)
        assert float(g) > 0
        eps = 1e-2
        fd = (float(mean_image(1.0 + eps)[0])
              - float(mean_image(1.0 - eps)[0])) / (2 * eps)
        np.testing.assert_allclose(float(g), fd, rtol=0.05)

    def test_environment_tint_gradient(self, camera):
        scene = make_scene()

        @jax.jit
        @jax.grad
        def mean_image(tint_scale):
            env = scene.environment._replace(
                tint=scene.environment.tint * tint_scale)
            return jnp.mean(render_sample(
                scene._replace(environment=env), camera, W, H, 0, SETTINGS))

        assert float(mean_image(1.0)) > 0


class TestGeometryGradients:
    """First slice of geometry gradients (SURVEY §7.2 step 7, VERDICT r1
    missing #7): positions of analytic entities — the sphere LIGHT in the
    flagship integrator and a scene sphere in SmallPT. Both flow through
    reparameterized analytic intersection/sampling (the sampled direction
    and hit point are differentiable functions of the entity's position),
    with occlusion and mesh-hit queries detached. Same-RNG evaluations
    make central differences low-noise; silhouette (boundary) terms are
    not estimated, so FD agreement is checked away from them."""

    def test_light_position_gradient_matches_fd(self, camera):
        scene = make_scene()

        @jax.jit
        @jax.value_and_grad
        def mean_image(dy):
            lights = scene.lights._replace(
                position=scene.lights.position.at[0, 1].add(dy))
            s = scene._replace(lights=lights)
            return jnp.mean(render_sample(s, camera, W, H, 0, SETTINGS))

        _, g = mean_image(0.0)
        g = float(g)
        eps = 1e-2
        fd = (float(mean_image(eps)[0])
              - float(mean_image(-eps)[0])) / (2 * eps)
        assert abs(g) > 1e-6, "light position gradient should be nonzero"
        np.testing.assert_allclose(g, fd, rtol=0.1)

    def test_mesh_box_translation_gradient_matches_fd(self, camera):
        """MESH geometry gradient, first slice (SURVEY §7.2 step 7): the
        silhouette-edge-sampled boundary term for translating a box in a
        mesh Cornell-style scene matches finite differences of the
        deterministic first-hit forward. The interior (pathwise) term is
        zero here — per-object-constant tints make the image purely
        visibility-driven, isolating the boundary estimator."""
        from bifrost3d_tpu.diff.mesh_edge_grad import (
            MeshEdges, edge_translation_gradient)
        from bifrost3d_tpu.geometry import make_box
        from bifrost3d_tpu.geometry.traverse import (
            intersect_triangles_brute)
        from bifrost3d_tpu.scene.camera import camera_ray_directions

        box = make_box(size=0.8)
        floor = make_plane(size=6.0)
        # Box floats above the floor: resting contact puts a kink in
        # M(t_y) at t_y = 0.4 (one-sided derivatives differ), which FD
        # would straddle.
        base = jnp.asarray([0.05, 0.62, 0.0], jnp.float32)
        tints = jnp.asarray([0.2, 0.55], jnp.float32)  # floor, box (mean)

        floor_tris = jnp.asarray(
            np.asarray(floor.positions)[np.asarray(floor.indices)],
            jnp.float32)
        box_tris_obj = jnp.asarray(
            np.asarray(box.positions)[np.asarray(box.indices)], jnp.float32)
        n_floor = floor_tris.shape[0]

        def first_hit_tint(t):
            def fn(origin, direction):
                tris = jnp.concatenate(
                    [floor_tris, box_tris_obj + t], axis=0)
                hit = intersect_triangles_brute(
                    tris, origin, direction, 1e-4, jnp.inf)
                tint = tints[(hit.prim >= n_floor).astype(jnp.int32)]
                return jnp.where(hit.prim >= 0, tint, 0.0)
            return fn

        cam = perspective_camera(eye=(1.3, 1.5, 2.4), target=(0, 0.3, 0))
        m = 384   # forward grid: FD quantization ~ grid spacing / step
        u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
        uu, vv = jnp.meshgrid(u, u)
        grid = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)
        o_grid, d_grid = camera_ray_directions(cam, grid)

        @jax.jit
        def forward(t):
            return jnp.mean(first_hit_tint(t)(o_grid, d_grid))

        edges = MeshEdges.build(box.positions, box.indices)
        g = np.asarray(edge_translation_gradient(
            cam, edges, base, first_hit_tint(base),
            samples_per_edge=64, edge_eps=1e-3))
        assert np.all(np.isfinite(g)) and np.max(np.abs(g)) > 1e-3, g

        h = 0.06
        for axis, rtol in ((0, 0.12), (1, 0.12)):
            e = jnp.zeros(3).at[axis].set(h)
            fd = float((forward(base + e) - forward(base - e)) / (2 * h))
            np.testing.assert_allclose(g[axis], fd, rtol=rtol, atol=2e-4)

    def test_smallpt_gradients_are_finite(self):
        """The SmallPT estimator's pathwise position gradient is finite
        (no masked-lane NaN leaks through miss-lane inf t or TIR sqrt).
        Note it is NOT expected to match FD — smallpt's throughput has no
        continuous position dependence (no NEE, per-sphere constant
        colors), so the true derivative is all boundary term; see
        test_edge_grad.py for the edge-sampled estimator that matches FD.
        """
        from bifrost3d_tpu.integrator.smallpt import (
            render_smallpt_accumulation)
        from bifrost3d_tpu.scene import smallpt_scene

        scene = smallpt_scene()
        g = jax.grad(lambda p: jnp.mean(render_smallpt_accumulation(
            scene._replace(position=p), 16, 12, 1)))(scene.position)
        assert np.all(np.isfinite(np.asarray(g)))


class TestInverseRendering:
    @pytest.mark.slow
    def test_render_loss_grad_full_scene(self, camera):
        """The public full-scene gradient API: cotangents reach materials,
        lights, and environment in one call. Slow tier: the whole-pytree
        backward compile alone costs ~1 min on CPU; the per-parameter
        gradients above cover the same estimator cheaply."""
        from bifrost3d_tpu.diff import render_loss_grad
        small = RenderSettings(max_bounce_count=1,
                               shading_models_present=(0,),
                               next_event_sample_count=1)
        scene = make_scene()
        target = jnp.zeros((6, 8, 3))
        loss, grads = render_loss_grad(
            scene, camera, target, 8, 6, jnp.uint32(0), small)
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(grads.materials.tint)))
        assert np.all(np.isfinite(np.asarray(grads.lights.power)))
        assert abs(float(grads.materials.tint[0].sum())) > 0

    def test_recover_tint(self, camera):
        """Optimize a wrong tint toward a target render (BASELINE config 5).

        One direct bounce suffices for tint recovery and halves the compile
        of the jitted train step (the dominant cost on CPU)."""
        settings = SETTINGS._replace(max_bounce_count=1)
        target_scene = make_scene(tint=(0.8, 0.2, 0.5))
        target = render_sample(target_scene, camera, W, H, 0, settings)

        start = make_scene(tint=(0.4, 0.6, 0.3))
        # Same-seed target + fixed samples: the loss has no MC noise floor,
        # so optimization must drive it down hard.
        result = optimize_materials(
            start, camera, target, W, H, steps=16, learning_rate=0.1,
            vary_samples=False, settings=settings)
        assert result.losses[-1] < 0.25 * result.losses[0], result.losses
        recovered = np.asarray(result.scene.materials.tint[0])
        np.testing.assert_allclose(recovered, [0.8, 0.2, 0.5], atol=0.15)


class TestGeometryGradientsSecondSlice:
    """VERDICT r3 #4: shadow-silhouette boundary terms and per-vertex edge
    velocities, FD-checked on deterministic first-hit forwards."""

    def _shadow_scene(self):
        from bifrost3d_tpu.geometry import make_box, make_plane
        from bifrost3d_tpu.geometry.traverse import intersect_triangles_brute

        box = make_box(size=0.6)
        floor = make_plane(size=8.0)
        floor_y = 0.0
        # Light z offset from the box faces (z = t_z ± 0.3): a light
        # exactly in a face plane makes that face edge-on — a
        # non-differentiable silhouette-topology kink FD would straddle.
        light = jnp.asarray([0.6, 2.5, 0.45], jnp.float32)
        intensity = 2.0
        box_tint = 0.55
        floor_tint = 0.2

        floor_tris = jnp.asarray(
            np.asarray(floor.positions)[np.asarray(floor.indices)],
            jnp.float32)
        box_tris_obj = jnp.asarray(
            np.asarray(box.positions)[np.asarray(box.indices)], jnp.float32)
        n_floor = floor_tris.shape[0]

        def radiance(t):
            """Deterministic direct-light forward: box pixels flat, floor
            pixels shaded with a binary shadow test against the box."""
            def fn(origin, direction):
                tris = jnp.concatenate([floor_tris, box_tris_obj + t], 0)
                hit = intersect_triangles_brute(tris, origin, direction,
                                                1e-4, jnp.inf)
                p = origin + direction * hit.t[..., None]
                to_l = light - p
                d2 = jnp.sum(to_l * to_l, axis=-1)
                ldir = to_l / jnp.sqrt(jnp.maximum(d2, 1e-12))[..., None]
                sh = intersect_triangles_brute(
                    box_tris_obj + t, p + ldir * 1e-3, ldir, 1e-4,
                    jnp.sqrt(jnp.maximum(d2, 1e-12)) - 2e-3)
                vis = jnp.where(sh.prim >= 0, 0.0, 1.0)
                cos_f = jnp.maximum(ldir[..., 1], 0.0)
                floor_l = floor_tint * intensity * cos_f * vis / jnp.maximum(
                    d2, 1e-6)
                val = jnp.where(hit.prim >= n_floor, box_tint, floor_l)
                return jnp.where(hit.prim >= 0, val, 0.0)
            return fn

        def occluder_fn(origin, direction):
            # The receiver is the floor plane y = floor_y (static).
            t = (floor_y - origin[:, 1]) / jnp.where(
                jnp.abs(direction[:, 1]) > 1e-9, direction[:, 1], 1e-9)
            t = jnp.where((direction[:, 1] < 0.0) & (t > 0.0), t, jnp.inf)
            point = jnp.broadcast_to(
                jnp.asarray([0.0, floor_y, 0.0]), origin.shape)
            normal = jnp.broadcast_to(
                jnp.asarray([0.0, 1.0, 0.0]), origin.shape)
            return t, point, normal

        return box, radiance, occluder_fn, light

    def test_shadow_edge_gradient_matches_fd(self):
        from bifrost3d_tpu.diff.mesh_edge_grad import (
            MeshEdges, edge_translation_gradient,
            shadow_edge_translation_gradient)
        from bifrost3d_tpu.scene.camera import (
            camera_ray_directions, perspective_camera)

        box, radiance, occluder_fn, light = self._shadow_scene()
        base = jnp.asarray([0.0, 0.9, 0.0], jnp.float32)
        cam = perspective_camera(eye=(0.4, 2.6, -3.2), target=(0, 0.4, 0))

        m = 384
        u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
        uu, vv = jnp.meshgrid(u, u)
        grid = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)
        o_grid, d_grid = camera_ray_directions(cam, grid)

        @jax.jit
        def forward(t):
            return jnp.mean(radiance(t)(o_grid, d_grid))

        edges = MeshEdges.build(box.positions, box.indices)
        g_primary = np.asarray(edge_translation_gradient(
            cam, edges, base, radiance(base), samples_per_edge=64,
            edge_eps=1.5e-3))
        g_shadow = np.asarray(shadow_edge_translation_gradient(
            cam, edges, base, light, radiance(base), occluder_fn,
            samples_per_edge=64, edge_eps=1.5e-3))
        g = g_primary + g_shadow
        assert np.all(np.isfinite(g))
        # The shadow term is a real contribution, not noise.
        assert np.max(np.abs(g_shadow)) > 1e-4, g_shadow

        h = 0.05
        for axis in (0, 2):
            e = jnp.zeros(3).at[axis].set(h)
            fd = float((forward(base + e) - forward(base - e)) / (2 * h))
            np.testing.assert_allclose(g[axis], fd, rtol=0.2, atol=3e-4)

    def test_vertex_gradient_matches_translation_sum(self):
        """Moving ALL canonical vertices together IS a translation: the
        per-vertex boundary gradients must sum to the translation
        gradient (a strong consistency check of the scatter weights)."""
        from bifrost3d_tpu.diff.mesh_edge_grad import (
            MeshEdges, edge_translation_gradient, edge_vertex_gradient)
        from bifrost3d_tpu.geometry import make_box, make_plane
        from bifrost3d_tpu.geometry.traverse import intersect_triangles_brute
        from bifrost3d_tpu.scene.camera import perspective_camera

        box = make_box(size=0.8)
        floor = make_plane(size=6.0)
        base = jnp.asarray([0.05, 0.62, 0.0], jnp.float32)
        tints = jnp.asarray([0.2, 0.55], jnp.float32)
        floor_tris = jnp.asarray(
            np.asarray(floor.positions)[np.asarray(floor.indices)],
            jnp.float32)
        box_tris_obj = jnp.asarray(
            np.asarray(box.positions)[np.asarray(box.indices)], jnp.float32)
        n_floor = floor_tris.shape[0]

        def first_hit_tint(origin, direction):
            tris = jnp.concatenate([floor_tris, box_tris_obj + base], 0)
            hit = intersect_triangles_brute(tris, origin, direction,
                                            1e-4, jnp.inf)
            tint = tints[(hit.prim >= n_floor).astype(jnp.int32)]
            return jnp.where(hit.prim >= 0, tint, 0.0)

        cam = perspective_camera(eye=(1.3, 1.5, 2.4), target=(0, 0.3, 0))
        edges = MeshEdges.build(box.positions, box.indices)
        n_verts = np.asarray(box.positions).shape[0]
        g_t = np.asarray(edge_translation_gradient(
            cam, edges, base, first_hit_tint, samples_per_edge=32))
        g_v = np.asarray(edge_vertex_gradient(
            cam, edges, base, first_hit_tint, n_verts,
            samples_per_edge=32))
        assert np.all(np.isfinite(g_v))
        # Only canonical (first-occurrence) vertices accumulate.
        # A box silhouette from one viewpoint touches ~6 corners.
        assert (np.abs(g_v).sum(axis=1) > 0).sum() >= 4
        np.testing.assert_allclose(g_v.sum(axis=0), g_t, rtol=1e-4,
                                   atol=1e-7)


def test_detached_replay_vjp_matches_plain_ad():
    """The detached-replay custom VJP (forward records hits, backward
    differentiates a trace-free replay) must produce bitwise-identical
    primals and matching gradients vs plain reverse-mode — including the
    reparameterized roughness path (wi recomputed from the RNG chain, not
    recorded). VERDICT r4 #3 / BASELINE north-star axis."""
    import jax

    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample, settings_for_scene)

    scene, cam = create_cornell_box()
    s_plain = settings_for_scene(scene, max_bounce_count=2)
    s_replay = settings_for_scene(scene, max_bounce_count=2,
                                  detached_replay_vjp=True)
    res = 16

    def loss(params, settings):
        tint, rough = params
        mats = scene.materials._replace(
            tint=scene.materials.tint.at[1].set(tint),
            roughness=scene.materials.roughness.at[1].set(rough))
        img = render_sample(scene._replace(materials=mats), cam,
                            res, res, jnp.uint32(0), settings)
        return jnp.mean(img)

    p0 = (scene.materials.tint[1], scene.materials.roughness[1])
    v1, g1 = jax.value_and_grad(lambda p: loss(p, s_plain))(p0)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, s_replay))(p0)
    assert float(v1) == float(v2)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(float(g1[1]), float(g2[1]),
                               rtol=1e-5, atol=1e-8)
