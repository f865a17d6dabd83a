"""Geometry tests: mesh utilities (reference MeshTest.h analogues), BVH
construction invariants, and traversal-vs-brute-force oracle checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.geometry import (
    build_bvh,
    combine_meshes,
    compute_hard_normals,
    compute_smooth_normals,
    count_degenerate_primitives,
    expand_indexed_buffers,
    intersect_bvh,
    intersect_bvh_any,
    intersect_triangles_brute,
    make_box,
    make_cylinder,
    make_plane,
    make_sphere,
    make_torus,
    merge_duplicate_vertices,
    mesh_aabb,
    normals_correspond_to_winding_order,
    transform_mesh,
)


def tri_soup(mesh):
    return jnp.asarray(np.asarray(mesh.positions)[np.asarray(mesh.indices)])


def random_rays(n, center, radius, seed=0):
    """Rays from random points on a bounding sphere aimed inward-ish."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * radius + center
    target = center + rng.normal(size=(n, 3)) * radius * 0.3
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


class TestMeshCreation:
    @pytest.mark.parametrize("maker,expect_closed", [
        (make_box, True), (make_sphere, True),
        (make_cylinder, True), (make_torus, True), (make_plane, False)])
    def test_no_degenerates_and_winding(self, maker, expect_closed):
        mesh = maker()
        assert count_degenerate_primitives(mesh) == 0
        assert normals_correspond_to_winding_order(mesh)

    def test_sphere_radius(self):
        mesh = make_sphere(radius=2.0)
        r = np.linalg.norm(np.asarray(mesh.positions), axis=-1)
        np.testing.assert_allclose(r, 2.0, rtol=1e-5)

    def test_box_bounds(self):
        mesh = make_box(size=(1.0, 2.0, 3.0))
        lo, hi = mesh_aabb(mesh)
        np.testing.assert_allclose(np.asarray(lo), [-0.5, -1.0, -1.5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi), [0.5, 1.0, 1.5], atol=1e-6)

    def test_spherical_box_lies_on_sphere(self):
        from bifrost3d_tpu.geometry import make_spherical_box
        mesh = make_spherical_box(radius=1.5, segments=6)
        r = np.linalg.norm(np.asarray(mesh.positions), axis=-1)
        np.testing.assert_allclose(r, 1.5, rtol=1e-5)
        assert count_degenerate_primitives(mesh) == 0
        assert normals_correspond_to_winding_order(mesh)
        # Normals point radially outward.
        n = np.asarray(mesh.normals)
        p = np.asarray(mesh.positions) / r[:, None]
        np.testing.assert_allclose(n, p, atol=1e-5)

    def test_beveled_box_bounds_and_rounding(self):
        from bifrost3d_tpu.geometry import make_beveled_box
        mesh = make_beveled_box(size=1.0, bevel=0.2, segments=4)
        lo, hi = mesh_aabb(mesh)
        np.testing.assert_allclose(np.asarray(lo), [-0.5] * 3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi), [0.5] * 3, atol=1e-6)
        assert count_degenerate_primitives(mesh) == 0
        assert normals_correspond_to_winding_order(mesh)
        # No vertex sits outside the rounded-box surface: distance from the
        # shrunken core is never more than the bevel radius.
        b = 0.2 * 0.5
        pos = np.asarray(mesh.positions)
        core = np.clip(pos, -(0.5 - b), 0.5 - b)
        d = np.linalg.norm(pos - core, axis=-1)
        assert d.max() <= b + 1e-5
        # Corners are actually rounded: the box corner is cut off.
        assert np.linalg.norm(pos, axis=-1).max() < np.sqrt(3) * 0.5 - 1e-3

    def test_beveled_box_zero_bevel_is_box(self):
        from bifrost3d_tpu.geometry import make_beveled_box
        mesh = make_beveled_box(size=(1.0, 2.0, 1.0), bevel=0.0, segments=2)
        lo, hi = mesh_aabb(mesh)
        np.testing.assert_allclose(np.asarray(lo), [-0.5, -1.0, -0.5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi), [0.5, 1.0, 0.5], atol=1e-6)


class TestMeshUtils:
    def test_hard_normals_are_face_normals(self):
        mesh = compute_hard_normals(make_box())
        idx = np.asarray(mesh.indices)
        pos = np.asarray(mesh.positions)
        n = np.asarray(mesh.normals)
        face_n = np.cross(pos[idx[:, 1]] - pos[idx[:, 0]], pos[idx[:, 2]] - pos[idx[:, 0]])
        face_n /= np.linalg.norm(face_n, axis=-1, keepdims=True)
        for k in range(3):
            np.testing.assert_allclose(n[idx[:, k]], face_n, atol=1e-5)

    def test_smooth_normals_on_sphere(self):
        mesh = make_sphere(slices=64, stacks=32)
        smoothed = compute_smooth_normals(mesh._replace(normals=None))
        n = np.asarray(smoothed.normals)
        p = np.asarray(mesh.positions)
        p = p / np.linalg.norm(p, axis=-1, keepdims=True)
        # Poles accumulate many faces; interior vertices agree closely.
        dots = np.sum(n * p, axis=-1)
        assert np.quantile(dots, 0.02) > 0.99

    def test_expand_and_merge_roundtrip(self):
        mesh = make_box()
        expanded = expand_indexed_buffers(mesh)
        assert expanded.vertex_count == 3 * mesh.triangle_count
        merged = merge_duplicate_vertices(expanded)
        # Box with per-face normals: 4 unique verts per face x 6 faces.
        assert merged.vertex_count == 24
        assert merged.triangle_count == mesh.triangle_count
        assert count_degenerate_primitives(merged) == 0

    def test_transform_mesh(self):
        mesh = make_box()
        m = np.asarray([[0, -1, 0, 5], [1, 0, 0, 0], [0, 0, 1, -2]], np.float32)
        out = transform_mesh(mesh, m)
        p_in = np.asarray(mesh.positions)
        p_out = np.asarray(out.positions)
        np.testing.assert_allclose(
            p_out, p_in @ m[:, :3].T + m[:, 3], atol=1e-5)
        n = np.asarray(out.normals)
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)

    def test_combine(self):
        a = make_box()
        b = transform_mesh(make_sphere(), np.asarray(
            [[1, 0, 0, 3], [0, 1, 0, 0], [0, 0, 1, 0]], np.float32))
        c = combine_meshes([a, b])
        assert c.triangle_count == a.triangle_count + b.triangle_count
        assert c.vertex_count == a.vertex_count + b.vertex_count
        lo, hi = mesh_aabb(c)
        assert float(hi[0]) > 3.0


class TestBVH:
    @pytest.mark.parametrize("maker", [make_sphere, make_torus, make_box])
    def test_invariants(self, maker):
        mesh = maker()
        bvh = build_bvh(mesh.positions, mesh.indices)
        a = np.asarray(bvh.node_a)
        cnt = np.asarray(bvh.node_count)
        prim = np.asarray(bvh.prim_indices)
        # Every triangle appears exactly once across leaves.
        leaf_prims = []
        for i in range(len(a)):
            if cnt[i] > 0:
                leaf_prims.extend(prim[a[i]:a[i] + cnt[i]])
        assert sorted(leaf_prims) == list(range(mesh.triangle_count))
        # Child boxes nest inside parents.
        lo = np.asarray(bvh.node_min)
        hi = np.asarray(bvh.node_max)
        for i in range(len(a)):
            if cnt[i] == 0:
                for child in (i + 1, a[i]):
                    assert np.all(lo[child] >= lo[i] - 1e-5)
                    assert np.all(hi[child] <= hi[i] + 1e-5)
        assert bvh.max_depth < 60

    @pytest.mark.parametrize("maker", [make_sphere, make_torus])
    def test_traversal_matches_brute_force(self, maker):
        mesh = maker()
        tris = tri_soup(mesh)
        bvh = build_bvh(mesh.positions, mesh.indices)
        o, d = random_rays(512, np.zeros(3), 3.0)
        brute = intersect_triangles_brute(tris, o, d)
        trav = intersect_bvh(bvh, tris, o, d)
        np.testing.assert_array_equal(np.asarray(trav.mask), np.asarray(brute.mask))
        m = np.asarray(brute.mask)
        np.testing.assert_allclose(
            np.asarray(trav.t)[m], np.asarray(brute.t)[m], rtol=1e-5)
        # Same primitive except exact-tie cases.
        same = np.asarray(trav.prim)[m] == np.asarray(brute.prim)[m]
        assert same.mean() > 0.999

    def test_any_hit_occlusion(self):
        mesh = make_sphere()
        tris = tri_soup(mesh)
        bvh = build_bvh(mesh.positions, mesh.indices)
        o, d = random_rays(256, np.zeros(3), 3.0, seed=2)
        occluded = np.asarray(intersect_bvh_any(bvh, tris, o, d))
        brute = intersect_triangles_brute(tris, o, d)
        np.testing.assert_array_equal(occluded, np.asarray(brute.mask))

    def test_native_builder_matches_numpy(self):
        """The C++ builder (native/bvh_builder.cpp) and the numpy reference
        builder must traverse identically."""
        from bifrost3d_tpu.geometry.native import native_available
        if not native_available():
            pytest.skip("no native toolchain")
        mesh = make_torus()
        tris = tri_soup(mesh)
        b_nat = build_bvh(mesh.positions, mesh.indices, use_native=True)
        b_np = build_bvh(mesh.positions, mesh.indices, use_native=False)
        o, d = random_rays(256, np.zeros(3), 3.0, seed=5)
        h_nat = intersect_bvh(b_nat, tris, o, d)
        h_np = intersect_bvh(b_np, tris, o, d)
        np.testing.assert_array_equal(np.asarray(h_nat.mask), np.asarray(h_np.mask))
        m = np.asarray(h_np.mask)
        np.testing.assert_allclose(
            np.asarray(h_nat.t)[m], np.asarray(h_np.t)[m], rtol=1e-6)

    def test_t_max_limits_hits(self):
        mesh = make_sphere()
        tris = tri_soup(mesh)
        bvh = build_bvh(mesh.positions, mesh.indices)
        o = jnp.asarray([[0.0, 0.0, 3.0]] * 2, jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 2, jnp.float32)
        near = intersect_bvh(bvh, tris, o, d, t_max=1.0)
        far = intersect_bvh(bvh, tris, o, d, t_max=10.0)
        assert not np.any(np.asarray(near.mask))
        assert np.all(np.asarray(far.mask))
        np.testing.assert_allclose(np.asarray(far.t), 2.5, atol=0.01)
