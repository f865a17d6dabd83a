"""Core/datamodel tests — counterparts of BifrostTests (SURVEY.md §4):
UID recycle/incarnation, change-notification semantics
(create_and_destroy_notifications), engine tick phases, scene-graph
traversal, and the handle_updates → accumulation-reset contract."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.core import Bitmask, ChangeSet, Engine, Keyboard, Mouse, TypedUIDGenerator
from bifrost3d_tpu.core.uid import UID
from bifrost3d_tpu.geometry import make_sphere
from bifrost3d_tpu.math.transform import Transform, transform_identity
from bifrost3d_tpu.scene.datamodel import SceneData, SceneSync


class TestUID:
    def test_generate_and_has(self):
        gen = TypedUIDGenerator()
        a = gen.generate()
        b = gen.generate()
        assert gen.has(a) and gen.has(b)
        assert a != b
        assert not gen.has(UID.invalid())

    def test_erase_invalidates(self):
        gen = TypedUIDGenerator()
        a = gen.generate()
        assert gen.erase(a)
        assert not gen.has(a)
        assert not gen.erase(a)

    def test_incarnation_detects_stale_handles(self):
        """The load-bearing UID property: a recycled slot rejects the old
        handle (UniqueIDGenerator.h:24-134)."""
        gen = TypedUIDGenerator(capacity=2)
        a = gen.generate()
        gen.erase(a)
        # Recycle until the same slot comes back.
        for _ in range(16):
            b = gen.generate()
            if b.index == a.index:
                break
            gen.erase(b)
        else:
            pytest.fail("slot never recycled")
        assert b.index == a.index and b.incarnation != a.incarnation
        assert gen.has(b) and not gen.has(a)

    def test_growth(self):
        gen = TypedUIDGenerator(capacity=2)
        ids = [gen.generate() for _ in range(100)]
        assert all(gen.has(i) for i in ids)
        assert len(set(int(i) for i in ids)) == 100
        assert sorted(i.index for i in gen) == sorted(i.index for i in ids)


class TestBitmaskChangeSet:
    def test_bitmask_queries(self):
        m = Bitmask(0b0110)
        assert m.is_set(0b0110) and m.any_set(0b0010)
        assert m.not_set(0b1000) and not m.is_set(0b0111)

    def test_changeset_accumulates_and_resets(self):
        cs = ChangeSet()
        a, b = UID(1, 0), UID(2, 0)
        cs.add_change(a, ChangeSet.CREATED)
        cs.add_change(a, ChangeSet.UPDATED)
        cs.set_change(b, ChangeSet.DESTROYED)
        assert cs.has_changes(a, ChangeSet.CREATED | ChangeSet.UPDATED)
        assert list(cs.get_changed_resources()) == [a, b]
        cs.reset_change_notifications()
        assert not cs.any_changes
        assert cs.get_changes(a) == 0


class TestEngine:
    def test_tick_phase_order(self):
        order = []
        e = Engine()
        e.add_mutating_callback(lambda _: order.append("mutate"))
        e.add_non_mutating_callback(lambda _: order.append("render"))
        e.add_tick_cleanup_callback(lambda _: order.append("cleanup"))
        e.do_tick(dt=0.016)
        assert order == ["mutate", "render", "cleanup"]
        assert e.time.ticks == 1 and e.time.delta == 0.016

    def test_quit_stops_run(self):
        e = Engine()
        count = []
        def cb(engine):
            count.append(1)
            if len(count) >= 3:
                engine.request_quit()
        e.add_mutating_callback(cb)
        e.run()
        assert len(count) == 3

    def test_window_change_bits(self):
        e = Engine()
        e.window.resize(800, 600)
        assert e.window.changes & e.window.CHANGE_RESIZED
        e.do_tick(0.016)
        assert e.window.changes == 0


class TestInput:
    def test_keyboard_taps(self):
        k = Keyboard()
        k.press("w")
        assert k.is_pressed("w") and k.was_pressed("w")
        k.per_frame_reset()
        assert k.is_pressed("w") and not k.was_pressed("w")
        k.release("w")
        assert k.was_released("w")

    def test_mouse_delta(self):
        m = Mouse()
        m.set_position(10, 10)
        m.per_frame_reset()
        m.set_position(15, 12)
        assert m.delta == (5, 2)
        m.button_tapped(Mouse.LEFT, True)
        assert m.is_pressed(Mouse.LEFT) and m.halftaps(Mouse.LEFT) == 1


class TestSceneGraph:
    def test_hierarchy_and_traversal(self):
        d = SceneData()
        root = d.nodes.create("root")
        a = d.nodes.create("a")
        b = d.nodes.create("b")
        c = d.nodes.create("c")
        d.nodes.set_parent(a, root)
        d.nodes.set_parent(b, root)
        d.nodes.set_parent(c, a)
        visited = []
        d.nodes.apply_recursively(root, lambda u: visited.append(d.nodes.get_name(u)))
        assert visited[0] == "root"
        assert set(visited) == {"root", "a", "b", "c"}
        # DFS: c right after a.
        assert visited.index("c") == visited.index("a") + 1


class TestSceneSync:
    def make_populated(self):
        d = SceneData()
        root = d.nodes.create("root")
        d.roots.create("scene", root, environment_tint=(0.2, 0.2, 0.2))
        mesh = d.meshes.create("sphere", make_sphere(radius=0.5))
        mat = d.materials.create("grey", tint=(0.5, 0.5, 0.5), roughness=0.6)
        node = d.nodes.create("obj")
        d.nodes.set_parent(node, root)
        d.models.create(node, mesh, mat)
        light_node = d.nodes.create("light", transform_identity()._replace(
            translation=jnp.asarray([0.0, 3.0, 0.0])))
        d.lights.create_sphere_light(light_node, (50, 50, 50), 0.3)
        return d, mat

    def test_sync_builds_and_resets_accumulation(self):
        d, mat = self.make_populated()
        sync = SceneSync(d)
        scene = sync.handle_updates()
        assert scene.tri_verts.shape[0] > 0
        assert scene.lights.count == 1
        d.reset_change_notifications()

        # No changes → same object, accumulation continues.
        sync.accumulations = 7
        assert sync.handle_updates() is scene
        assert sync.accumulations == 7

        # A material edit → rebuild + accumulation reset
        # (Renderer.cpp:1202-1204 semantics).
        d.materials.set_tint(mat, (0.9, 0.1, 0.1))
        scene2 = sync.handle_updates()
        assert scene2 is not scene
        assert sync.accumulations == 0
        np.testing.assert_allclose(
            np.asarray(scene2.materials.tint[0]), [0.9, 0.1, 0.1])

    def test_created_and_destroyed_same_tick_ignored(self):
        """ChangeSet edge the reference tests: an asset created and
        destroyed within one tick leaves no usable resource."""
        d, _ = self.make_populated()
        sync = SceneSync(d)
        sync.handle_updates()
        d.reset_change_notifications()
        m = d.meshes.create("tmp", make_sphere(radius=0.1))
        d.meshes.destroy(m)
        scene = sync.handle_updates()  # rebuild (changes happened)…
        assert not d.meshes.has(m)     # …but the mesh is gone


class TestIncrementalSceneSync:
    """VERDICT r3 #7: ChangeSet bits skip rebuild stages — a material edit
    reuses the geometry/texture buffers by OBJECT IDENTITY; a light edit
    reuses geometry + materials; structural changes still rebuild fully."""

    def _populated(self):
        d = SceneData()
        root = d.nodes.create("root")
        d.roots.create("scene", root, environment_tint=(0.2, 0.2, 0.2))
        mesh = d.meshes.create("sphere", make_sphere(radius=0.5))
        mat = d.materials.create("grey", tint=(0.5, 0.5, 0.5), roughness=0.6)
        node = d.nodes.create("obj")
        d.nodes.set_parent(node, root)
        d.models.create(node, mesh, mat)
        light_node = d.nodes.create("light", transform_identity()._replace(
            translation=jnp.asarray([0.0, 3.0, 0.0])))
        light = d.lights.create_sphere_light(light_node, (50, 50, 50), 0.3)
        return d, mat, light

    def test_material_edit_reuses_geometry(self):
        d, mat, _ = self._populated()
        sync = SceneSync(d)
        scene = sync.handle_updates()
        d.reset_change_notifications()

        d.materials.set_tint(mat, (0.9, 0.1, 0.1))
        scene2 = sync.handle_updates()
        assert sync.accumulations == 0
        np.testing.assert_allclose(
            np.asarray(scene2.materials.tint[0]), [0.9, 0.1, 0.1])
        # Geometry / accel / texture / light buffers reused by identity.
        assert scene2.tri_verts is scene.tri_verts
        assert scene2.bvh is scene.bvh
        assert scene2.tri_components is scene.tri_components
        assert scene2.textures is scene.textures
        assert scene2.lights is scene.lights

    def test_light_edit_reuses_geometry_and_materials(self):
        d, _, light = self._populated()
        sync = SceneSync(d)
        scene = sync.handle_updates()
        d.reset_change_notifications()

        d.lights.set_power(light, (10, 10, 10))
        scene2 = sync.handle_updates()
        np.testing.assert_allclose(np.asarray(scene2.lights.power[0]),
                                   [10, 10, 10])
        assert scene2.tri_verts is scene.tri_verts
        assert scene2.materials is scene.materials

    def test_structural_change_rebuilds(self):
        d, mat, _ = self._populated()
        sync = SceneSync(d)
        scene = sync.handle_updates()
        d.reset_change_notifications()

        # Creating a material shifts indices → full rebuild.
        d.materials.create("new", tint=(0.1, 0.9, 0.1))
        scene2 = sync.handle_updates()
        assert scene2.materials.count == 2
        # Mesh edit → full rebuild (tri_verts replaced).
        d.reset_change_notifications()
        d.meshes.set_mesh(list(d.meshes)[0], make_sphere(radius=0.7))
        scene3 = sync.handle_updates()
        assert scene3.tri_verts is not scene2.tri_verts

    def test_environment_tint_edit_reuses_geometry(self):
        d, _, _ = self._populated()
        sync = SceneSync(d)
        scene = sync.handle_updates()
        d.reset_change_notifications()

        root_id = list(d.roots)[0]
        d.roots.set_environment_tint(root_id, (1.0, 0.5, 0.25))
        scene2 = sync.handle_updates()
        np.testing.assert_allclose(np.asarray(scene2.environment_tint),
                                   [1.0, 0.5, 0.25])
        assert scene2.tri_verts is scene.tri_verts
        assert scene2.materials is scene.materials


class TestTransformRefit:
    def test_transform_edit_refits_without_rebuild(self):
        """Node transform edit → soup retransform + BVH REFIT: topology
        arrays are reused by identity, boxes move, materials/textures are
        untouched, and intersections against the moved geometry are
        correct (Renderer.cpp:1010-1041 semantics)."""
        d = SceneData()
        root = d.nodes.create("root")
        d.roots.create("scene", root)
        mesh = d.meshes.create("sphere", make_sphere(radius=0.5))
        mat = d.materials.create("grey", tint=(0.5, 0.5, 0.5))
        node = d.nodes.create("obj")
        d.nodes.set_parent(node, root)
        d.models.create(node, mesh, mat)
        sync = SceneSync(d)
        scene = sync.handle_updates()
        d.reset_change_notifications()

        d.nodes.set_global_transform(node, transform_identity()._replace(
            translation=jnp.asarray([3.0, 0.0, 0.0])))
        scene2 = sync.handle_updates()
        # Topology reused by identity; geometry arrays replaced.
        assert scene2.bvh.node_a is scene.bvh.node_a
        assert scene2.bvh.prim_indices is scene.bvh.prim_indices
        assert scene2.materials is scene.materials
        assert scene2.textures is scene.textures
        assert scene2.tri_verts is not scene.tri_verts
        # Boxes actually moved with the geometry.
        assert abs(float(scene2.bvh.node_min[0, 0])
                   - (float(scene.bvh.node_min[0, 0]) + 3.0)) < 1e-5
        # The moved sphere intersects correctly through the refit BVH.
        from bifrost3d_tpu.geometry.traverse import intersect_bvh
        o = jnp.asarray([[3.0, 0.0, -5.0]])
        dir_ = jnp.asarray([[0.0, 0.0, 1.0]])
        hit = intersect_bvh(scene2.bvh, scene2.tri_verts, o, dir_, 1e-4)
        assert bool(hit.mask[0])

    def test_refit_matches_full_rebuild_render(self):
        """A refit scene renders the same image as a full rebuild."""
        import numpy as np
        from bifrost3d_tpu.integrator.path_tracer import (
            render_sample, settings_for_scene)
        from bifrost3d_tpu.scene.camera import perspective_camera

        d = SceneData()
        root = d.nodes.create("root")
        d.roots.create("scene", root, environment_tint=(0.4, 0.5, 0.6))
        mesh = d.meshes.create("sphere", make_sphere(radius=0.5))
        mat = d.materials.create("red", tint=(0.8, 0.2, 0.2))
        node = d.nodes.create("obj")
        d.nodes.set_parent(node, root)
        d.models.create(node, mesh, mat)
        light_node = d.nodes.create("light", transform_identity()._replace(
            translation=jnp.asarray([0.0, 3.0, 0.0])))
        d.lights.create_sphere_light(light_node, (50, 50, 50), 0.3)
        sync = SceneSync(d)
        sync.handle_updates()
        d.reset_change_notifications()

        move = transform_identity()._replace(
            translation=jnp.asarray([0.5, 0.2, 0.0]))
        d.nodes.set_global_transform(node, move)
        refit_scene = sync.handle_updates()

        # Full rebuild of the same state for comparison.
        sync2 = SceneSync(d)
        rebuilt = sync2.handle_updates()

        cam = perspective_camera(eye=(0, 0.5, -3.0), target=(0.5, 0.2, 0))
        s1 = settings_for_scene(refit_scene, max_bounce_count=1)
        a = np.asarray(render_sample(refit_scene, cam, 32, 32,
                                     jnp.uint32(0), s1))
        b = np.asarray(render_sample(rebuilt, cam, 32, 32,
                                     jnp.uint32(0), s1))
        np.testing.assert_allclose(a, b, atol=1e-5)
