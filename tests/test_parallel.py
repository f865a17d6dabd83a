"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
same-seed single-device vs multi-device renders must agree)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.integrator.smallpt import render_smallpt_accumulation
from bifrost3d_tpu.parallel import make_sharded_smallpt, render_mesh
from bifrost3d_tpu.scene import smallpt_scene


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return render_mesh(jax.devices()[:8])


class TestShardedRender:
    def test_matches_single_device(self, mesh8):
        """Sharded and single-device renders of the same accumulation are
        identical — the sharding only partitions pixel rows."""
        scene = smallpt_scene()
        render = make_sharded_smallpt(mesh8, 32, 24)
        sharded = np.asarray(render(scene, jnp.uint32(1)))
        single = np.asarray(render_smallpt_accumulation(scene, 32, 24, 1))
        np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)

    def test_non_divisible_height(self, mesh8):
        """Heights that don't divide the mesh get padded and cropped."""
        scene = smallpt_scene()
        render = make_sharded_smallpt(mesh8, 16, 13)
        sharded = np.asarray(render(scene, jnp.uint32(2)))
        single = np.asarray(render_smallpt_accumulation(scene, 16, 13, 2))
        assert sharded.shape == (13, 16, 3)
        np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)

    def test_output_is_row_sharded(self, mesh8):
        scene = smallpt_scene()
        render = make_sharded_smallpt(mesh8, 16, 16)
        out = render(scene, jnp.uint32(1))
        shard_rows = {int(s.index[0].start or 0) for s in out.addressable_shards}
        assert len(shard_rows) == 8


class TestShardedMeshRender:
    """Full wavefront integrator sharded over the tile axis (SURVEY.md §2.8:
    ray/tile DP with the scene replicated)."""

    def test_matches_single_device(self, mesh8):
        import jax.numpy as jnp
        from bifrost3d_tpu.apps.scenes import create_cornell_box
        from bifrost3d_tpu.integrator.path_tracer import (
            render_sample, settings_for_scene)
        from bifrost3d_tpu.parallel import make_sharded_render

        scene, cam = create_cornell_box()
        W = H = 16
        # settings_for_scene narrows shading_models_present to what the
        # scene uses, and RIS(1)/zero passthrough-slack shrink the compiled
        # graph further — XLA compile time dominated this test's wall time
        # on CPU. The sharding invariant is independent of those knobs;
        # RIS(3) semantics are covered by test_path_tracer.
        settings = settings_for_scene(scene, max_bounce_count=2)._replace(
            next_event_sample_count=1, passthrough_slack=0)
        render = make_sharded_render(mesh8, W, H, settings)
        sharded = np.asarray(render(scene, cam, 1))
        single = np.asarray(render_sample(scene, cam, W, H,
                                          jnp.uint32(1), settings))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_gradient_allreduce_smallpt_matches_unsharded(self, mesh8):
        """Fast tier of the psum-gradient parity invariant: the sharding
        machinery (row split, psum, padding mask) is integrator-agnostic,
        so the cheap-to-compile SmallPT estimator carries the default-tier
        check; the mesh-wavefront versions below are slow-tier (and the
        driver's dryrun_multichip runs the full sharded train step every
        round)."""
        import jax
        from functools import partial
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from bifrost3d_tpu.integrator.smallpt import render_smallpt_pixels
        from bifrost3d_tpu.parallel.mesh import TILE_AXIS, pad_to_multiple

        scene = smallpt_scene()
        W, H = 16, 12

        def full_loss(color):
            sc = scene._replace(color=color)
            img = render_smallpt_accumulation(sc, W, H, 1)
            return jnp.mean(jnp.square(img))

        g_ref = jax.grad(full_loss)(scene.color)
        assert bool(jnp.all(jnp.isfinite(g_ref)))

        n_dev = mesh8.devices.size
        padded_h = pad_to_multiple(H, n_dev)
        y = jnp.broadcast_to(
            jnp.arange(padded_h, dtype=jnp.uint32)[:, None], (padded_h, W))
        x = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.uint32)[None, :], (padded_h, W))
        denom = float(W * H * 3)

        @partial(shard_map, mesh=mesh8,
                 in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS)),
                 out_specs=P(), check_vma=False)
        def grad_shard(color, xs, ys):
            def local(c):
                img = render_smallpt_pixels(
                    scene._replace(color=c), xs, ys, W, H, jnp.uint32(1))
                in_image = (ys < H)[..., None]
                return jnp.sum(jnp.where(in_image, jnp.square(img), 0.0))
            g = jax.grad(local)(color)
            return jax.lax.psum(g, TILE_AXIS) / denom

        g_sh = grad_shard(scene.color, x, y)
        # Reduction order differs (mean over the dense grid vs masked
        # row-sharded sums): agreement is f32-noise-level, not bitwise.
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   atol=1e-5, rtol=2e-3)

    @pytest.mark.slow
    def test_gradient_allreduce_matches_unsharded(self, mesh8):
        """The DP training step's psum gradient all-reduce reproduces the
        single-device gradient (BASELINE 'multi-host == single-host')."""
        import jax
        import jax.numpy as jnp
        from functools import partial
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from bifrost3d_tpu.apps.scenes import create_cornell_box
        from bifrost3d_tpu.integrator.path_tracer import (
            render_sample, render_sample_pixels, settings_for_scene)
        from bifrost3d_tpu.parallel.mesh import TILE_AXIS, pad_to_multiple

        scene, cam = create_cornell_box()
        W = H = 8
        settings = settings_for_scene(scene, max_bounce_count=1)._replace(
            next_event_sample_count=1, passthrough_slack=0)
        target = render_sample(scene, cam, W, H, jnp.uint32(3), settings)

        def loss_unsharded(tint):
            sc = scene._replace(
                materials=scene.materials._replace(tint=tint))
            img = render_sample(sc, cam, W, H, jnp.uint32(1), settings)
            return jnp.mean(jnp.square(img - target))

        g_ref = jax.grad(loss_unsharded)(scene.materials.tint)
        assert bool(jnp.all(jnp.isfinite(g_ref)))  # NaN-regression gate

        n_dev = mesh8.devices.size
        padded_h = pad_to_multiple(H, n_dev)
        y = jnp.broadcast_to(
            jnp.arange(padded_h, dtype=jnp.uint32)[:, None], (padded_h, W))
        x = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.uint32)[None, :], (padded_h, W))
        denom = float(W * H * 3)

        @partial(shard_map, mesh=mesh8,
                 in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
                 out_specs=P(), check_vma=False)
        def grad_shard(tint, xs, ys, tgt):
            def local(t):
                sc = scene._replace(
                    materials=scene.materials._replace(tint=t))
                img = render_sample_pixels(sc, cam, xs, ys, W, H,
                                           jnp.uint32(1), settings)
                in_image = (ys < H)[..., None]
                return jnp.sum(jnp.where(in_image,
                                         jnp.square(img - tgt), 0.0))
            g = jax.grad(local)(tint)
            return jax.lax.psum(g, TILE_AXIS) / denom

        tpad = jnp.zeros((padded_h, W, 3)).at[:H].set(target)
        g_sh = grad_shard(scene.materials.tint, x, y, tpad)
        # Cross-device reduction order differs from the single-device sum:
        # agreement is f32-noise-level, not bitwise.
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   atol=2e-6, rtol=2e-4)

    @pytest.mark.slow
    def test_train_step_reduces_loss(self, mesh8):
        import jax.numpy as jnp
        from bifrost3d_tpu.apps.scenes import create_cornell_box
        from bifrost3d_tpu.integrator.path_tracer import (
            render_sample, settings_for_scene)
        from bifrost3d_tpu.parallel import make_sharded_train_step

        scene, cam = create_cornell_box()
        W = H = 16
        settings = settings_for_scene(scene, max_bounce_count=1)._replace(
            next_event_sample_count=1, passthrough_slack=0)
        target = render_sample(scene, cam, W, H, jnp.uint32(1), settings)
        start = scene._replace(materials=scene.materials._replace(
            tint=jnp.clip(scene.materials.tint * 0.6 + 0.15, 0.0, 1.0)))

        init_fn, step_fn = make_sharded_train_step(
            mesh8, W, H, settings, learning_rate=2e-2)
        params, opt_state = init_fn(start)
        losses = []
        for i in range(5):
            params, opt_state, loss = step_fn(
                params, opt_state, start, cam, target, 1)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


class TestUnifiedTrainStep:
    def test_recovers_materials_and_translation_jointly(self, mesh8):
        """One step optimizes the FULL parameter surface (VERDICT r4 #8):
        tint, roughness, metallic, specularity, emission, light power AND
        a box translation, jointly, with psum'd sharded gradients."""
        import jax.numpy as jnp
        from bifrost3d_tpu.diff.mesh_edge_grad import MeshEdges
        from bifrost3d_tpu.geometry import make_box, make_plane
        from bifrost3d_tpu.integrator.path_tracer import (
            render_sample, settings_for_scene)
        from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
        from bifrost3d_tpu.parallel import make_sharded_train_step
        from bifrost3d_tpu.scene.camera import perspective_camera
        from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
        from bifrost3d_tpu.scene.render_scene import build_render_scene

        mats = MaterialArray.build([
            dielectric((0.8, 0.8, 0.8), 0.9),
            dielectric((0.9, 0.2, 0.2), 0.6),
        ])
        floor = make_plane(size=6.0)
        box = make_box(size=0.8)
        instances = [(floor, 0, None), (box, 1, None)]
        lights = LightArray.build([
            {"kind": LIGHT_SPHERE, "position": (0.5, 2.5, -0.5),
             "radius": 0.2, "power": (40.0, 40.0, 40.0)}])
        scene = build_render_scene(instances, mats, lights)
        n_floor = np.asarray(floor.indices).reshape(-1, 3).shape[0]
        n_box = np.asarray(box.indices).reshape(-1, 3).shape[0]
        scene = scene._replace(tri_verts=scene.tri_verts.at[
            n_floor:n_floor + n_box].add(jnp.asarray([0.0, 0.9, 0.0])))
        cam = perspective_camera(eye=(0.0, 2.2, -3.0), target=(0, 0.6, 0))
        settings = settings_for_scene(scene, max_bounce_count=1,
                                      next_event_sample_count=1)
        W = H = 32

        # Target: box shifted AND tinted differently, brighter light.
        target_t = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
        target_tint = scene.materials.tint.at[1].set(
            jnp.asarray([0.2, 0.8, 0.3]))
        target_scene = scene._replace(
            tri_verts=scene.tri_verts.at[
                n_floor:n_floor + n_box].add(target_t),
            materials=scene.materials._replace(tint=target_tint))
        target = render_sample(target_scene, cam, W, H, jnp.uint32(0),
                               settings)

        edges = MeshEdges.build(
            np.asarray(box.positions) + np.asarray([0.0, 0.9, 0.0]),
            box.indices)
        init_fn, step_fn = make_sharded_train_step(
            mesh8, W, H, settings, learning_rate=2e-2,
            tri_range=(n_floor, n_floor + n_box), object_edges=edges,
            samples_per_edge=8)
        params, opt_state = init_fn(scene)
        tint_err0 = float(jnp.abs(params["tint"][1]
                                  - target_tint[1]).sum())
        losses = []
        for n in range(16):
            params, opt_state, loss = step_fn(
                params, opt_state, scene, cam, target, jnp.uint32(0))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        # Joint optimization over 7 parameter families on a 32x32 stochastic
        # estimate is noisy step-to-step; gate on the smoothed tail.
        assert np.mean(losses[-4:]) < losses[0], losses
        # Both parameter families moved toward the target.
        t_err = float(jnp.linalg.norm(params["translation"] - target_t))
        assert t_err < float(jnp.linalg.norm(target_t)) * 0.9, (
            t_err, np.asarray(params["translation"]))
        tint_err = float(jnp.abs(params["tint"][1] - target_tint[1]).sum())
        assert tint_err < tint_err0 * 0.9, (tint_err, tint_err0)


class TestShardedGeometryTrainStep:
    def test_recovers_box_translation(self, mesh8):
        """The sharded geometry step (interior autodiff + loss-adjoint
        silhouette boundary term, psum over the tiles axis) moves a box's
        translation toward the target pose (VERDICT r3 #4)."""
        from bifrost3d_tpu.diff.mesh_edge_grad import MeshEdges
        from bifrost3d_tpu.geometry import make_box, make_plane
        from bifrost3d_tpu.integrator.path_tracer import settings_for_scene
        from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
        from bifrost3d_tpu.parallel.render import (
            make_sharded_geometry_train_step)
        from bifrost3d_tpu.scene.camera import perspective_camera
        from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
        from bifrost3d_tpu.scene.render_scene import build_render_scene

        mats = MaterialArray.build([
            dielectric((0.8, 0.8, 0.8), 0.9),
            dielectric((0.9, 0.2, 0.2), 0.9),
        ])
        floor = make_plane(size=6.0)
        box = make_box(size=0.8)
        instances = [(floor, 0, None), (box, 1, None)]
        lights = LightArray.build([
            {"kind": LIGHT_SPHERE, "position": (0.5, 2.5, -0.5),
             "radius": 0.2, "power": (40.0, 40.0, 40.0)}])
        scene = build_render_scene(instances, mats, lights)
        n_floor = np.asarray(floor.indices).reshape(-1, 3).shape[0]
        n_box = np.asarray(box.indices).reshape(-1, 3).shape[0]
        # Lift the box off the floor so silhouettes are clean.
        scene = scene._replace(tri_verts=scene.tri_verts.at[
            n_floor:n_floor + n_box].add(jnp.asarray([0.0, 0.9, 0.0])))
        cam = perspective_camera(eye=(0.0, 2.2, -3.0), target=(0, 0.6, 0))
        settings = settings_for_scene(scene, max_bounce_count=1,
                                      next_event_sample_count=1)
        W = H = 48

        edges = MeshEdges.build(
            np.asarray(box.positions) + np.asarray([0.0, 0.9, 0.0]),
            box.indices)
        init_fn, step_fn = make_sharded_geometry_train_step(
            mesh8, W, H, (n_floor, n_floor + n_box), edges,
            settings=settings, learning_rate=4e-2, samples_per_edge=8)

        from bifrost3d_tpu.integrator.path_tracer import render_sample
        target_t = jnp.asarray([0.35, 0.0, 0.0], jnp.float32)
        target_scene = scene._replace(tri_verts=scene.tri_verts.at[
            n_floor:n_floor + n_box].add(target_t))
        target = render_sample(target_scene, cam, W, H, jnp.uint32(0),
                               settings)

        translation, opt_state = init_fn()
        first_err = float(jnp.linalg.norm(translation - target_t))
        losses = []
        for n in range(12):
            translation, opt_state, loss = step_fn(
                translation, opt_state, scene, cam, target, jnp.uint32(0))
            losses.append(float(loss))
        err = float(jnp.linalg.norm(translation - target_t))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses
        assert err < first_err * 0.7, (err, first_err,
                                       np.asarray(translation))
