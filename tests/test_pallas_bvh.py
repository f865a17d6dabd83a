"""Hierarchical Pallas BVH traversal (geometry/pallas_bvh.py).

The kernel's contract — identical hits to the dense reference intersector
— is exercised in interpreter mode on CPU (SURVEY.md §4 "GPU code tested
on CPU"); the real-TPU speed/parity evidence lives in bench.py --full.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.geometry.bvh import build_bvh_boxes
from bifrost3d_tpu.geometry.pallas_bvh import (
    CLUSTER_T, HierTriangles, hierarchical_intersect, pack_hierarchical)
from bifrost3d_tpu.geometry.traverse import intersect_triangles_brute


def _soup(n, seed=0, lo=-1.0, hi=1.0, size=0.05):
    rng = np.random.default_rng(seed)
    c = rng.uniform(lo, hi, (n, 1, 3))
    return (c + rng.uniform(-size, size, (n, 3, 3))).astype(np.float32)


def _rays(r, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestBuildBvhBoxes:
    def test_native_matches_numpy(self):
        rng = np.random.default_rng(3)
        lo = rng.uniform(-5, 5, (37, 3))
        hi = lo + rng.uniform(0.1, 2.0, (37, 3))
        a = build_bvh_boxes(lo, hi, max_leaf=1, use_native=True)
        b = build_bvh_boxes(lo, hi, max_leaf=1, use_native=False)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_singleton_leaves(self):
        rng = np.random.default_rng(4)
        lo = rng.uniform(-5, 5, (21, 3))
        hi = lo + 0.5
        bvh = build_bvh_boxes(lo, hi, max_leaf=1)
        cnt = np.asarray(bvh.node_count)
        assert cnt.max() == 1
        assert (cnt > 0).sum() == 21             # one leaf per box
        assert sorted(np.asarray(bvh.prim_indices)) == list(range(21))


class TestPackHierarchical:
    def test_meta_encoding(self):
        tri = _soup(1200)
        packed = pack_hierarchical(tri)
        meta = np.asarray(packed.node_meta)
        leaves = meta[meta < 0]
        # Treelet-cut packing may emit partially-filled clusters, so the
        # cluster count is >= ceil(t / CLUSTER_T); every cluster id in
        # [0, K) must still appear exactly once as a leaf.
        n_clusters = len(leaves)
        assert n_clusters >= -(-1200 // CLUSTER_T)
        assert sorted(-leaves - 1) == list(range(n_clusters))
        # Valid slots (non-degenerate packed triangles — padding slots have
        # e1 = e2 = 0) hold each triangle id exactly once; treelet-cut
        # packing interleaves padded slots inside clusters, so the
        # permutation check must mask them rather than truncate.
        comp = np.asarray(packed.tri_components)
        valid = np.any(comp[3:9] != 0.0, axis=0)
        order = np.asarray(packed.order)[valid]
        assert sorted(order) == list(range(1200))

    def test_single_cluster_scene(self):
        tri = _soup(100)
        packed = pack_hierarchical(tri)
        meta = np.asarray(packed.node_meta)
        assert meta[0] == -1                      # root is leaf of cluster 0


class TestHierarchicalIntersect:
    @pytest.fixture(scope="class")
    def scene(self):
        tri = _soup(1200)
        return jnp.asarray(tri), pack_hierarchical(tri)

    def test_nearest_matches_brute(self, scene):
        tri, packed = scene
        o, d = _rays(600)
        ref = intersect_triangles_brute(tri, o, d, 1e-4, jnp.inf)
        got = hierarchical_intersect(packed, o, d, 1e-4, jnp.inf,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.prim),
                                      np.asarray(got.prim))
        m = np.asarray(ref.prim) >= 0
        np.testing.assert_allclose(np.asarray(ref.t)[m], np.asarray(got.t)[m],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref.u)[m], np.asarray(got.u)[m],
                                   rtol=1e-4, atol=1e-5)

    def test_any_hit_occlusion(self, scene):
        tri, packed = scene
        o, d = _rays(600, seed=2)
        ref = intersect_triangles_brute(tri, o, d, 1e-4, jnp.inf)
        got = hierarchical_intersect(packed, o, d, 1e-4, jnp.inf,
                                     any_hit=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.prim >= 0),
                                      np.asarray(got.prim >= 0))

    def test_bounded_t_max(self, scene):
        """Shadow-segment style query: occluders beyond t_max don't count."""
        tri, packed = scene
        o, d = _rays(600, seed=5)
        ref_inf = intersect_triangles_brute(tri, o, d, 1e-4, jnp.inf)
        t_max = jnp.where(jnp.isfinite(ref_inf.t), ref_inf.t * 0.5, 0.5)
        ref = intersect_triangles_brute(tri, o, d, 1e-4, t_max)
        got = hierarchical_intersect(packed, o, d, 1e-4, t_max,
                                     any_hit=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.prim >= 0),
                                      np.asarray(got.prim >= 0))

    def test_single_cluster_nearest(self):
        tri_np = _soup(100, seed=7)
        tri = jnp.asarray(tri_np)
        packed = pack_hierarchical(tri_np)
        o, d = _rays(300, seed=8)
        ref = intersect_triangles_brute(tri, o, d, 1e-4, jnp.inf)
        got = hierarchical_intersect(packed, o, d, 1e-4, jnp.inf,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.prim),
                                      np.asarray(got.prim))


class TestSortedIntersect:
    def test_sorted_matches_unsorted(self):
        from bifrost3d_tpu.geometry.pallas_bvh import (
            hierarchical_intersect_sorted)
        tri = _soup(1200)
        packed = pack_hierarchical(tri)
        o, d = _rays(600, seed=5)
        ref = hierarchical_intersect(packed, jnp.asarray(o), jnp.asarray(d),
                                     1e-4, jnp.inf, interpret=True)
        got = hierarchical_intersect_sorted(
            packed, jnp.asarray(o), jnp.asarray(d), 1e-4, jnp.inf,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.prim),
                                      np.asarray(got.prim))
        m = np.asarray(ref.prim) >= 0
        np.testing.assert_allclose(np.asarray(ref.t)[m],
                                   np.asarray(got.t)[m], rtol=1e-5)


class TestLivePrefix:
    def test_dead_blocks_report_misses(self):
        from bifrost3d_tpu.geometry.pallas_bvh import BLOCK_R
        tri = _soup(1200)
        packed = pack_hierarchical(tri)
        o, d = _rays(4 * BLOCK_R, seed=7)
        full = hierarchical_intersect(packed, jnp.asarray(o), jnp.asarray(d),
                                      1e-4, jnp.inf, interpret=True)
        from bifrost3d_tpu.geometry.pallas_bvh import GROUP_R
        live = jnp.int32(BLOCK_R + 3)  # prefix ends inside block 1, group 0
        part = hierarchical_intersect(packed, jnp.asarray(o), jnp.asarray(d),
                                      1e-4, jnp.inf, interpret=True,
                                      live_count=live)
        # Groups covering the prefix match the full trace...
        covered = BLOCK_R + GROUP_R
        np.testing.assert_array_equal(np.asarray(part.prim[:covered]),
                                      np.asarray(full.prim[:covered]))
        # ...groups past the prefix report misses without work.
        assert np.all(np.asarray(part.prim[covered:]) == -1)

    def test_dense_kernel_live_prefix(self):
        from bifrost3d_tpu.geometry.pallas_intersect import (
            BLOCK_R as DENSE_BLOCK, pack_triangles, pallas_intersect)
        tri = _soup(600)
        comp, n = pack_triangles(jnp.asarray(tri))
        o, d = _rays(2 * DENSE_BLOCK, seed=9)
        full = pallas_intersect(comp, n, jnp.asarray(o), jnp.asarray(d),
                                1e-4, jnp.inf, interpret=True)
        part = pallas_intersect(comp, n, jnp.asarray(o), jnp.asarray(d),
                                1e-4, jnp.inf, interpret=True,
                                live_count=jnp.int32(DENSE_BLOCK))
        np.testing.assert_array_equal(np.asarray(part.prim[:DENSE_BLOCK]),
                                      np.asarray(full.prim[:DENSE_BLOCK]))
        assert np.all(np.asarray(part.prim[DENSE_BLOCK:]) == -1)


class TestVmemIntersect:
    """VMEM-resident traversal variant (pallas_bvh_vmem.py)."""

    @pytest.fixture(scope="class")
    def scene(self):
        tri = _soup(1200)
        from bifrost3d_tpu.geometry.pallas_bvh_vmem import pack_vmem
        return jnp.asarray(tri), pack_vmem(tri)

    def test_nearest_matches_brute(self, scene):
        from bifrost3d_tpu.geometry.pallas_bvh_vmem import vmem_intersect
        tri, packed = scene
        o, d = _rays(600)
        ref = intersect_triangles_brute(tri, o, d, 1e-4, jnp.inf)
        got = vmem_intersect(packed, o, d, 1e-4, jnp.inf, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.prim),
                                      np.asarray(got.prim))
        m = np.asarray(ref.prim) >= 0
        np.testing.assert_allclose(np.asarray(ref.t)[m],
                                   np.asarray(got.t)[m], rtol=1e-5,
                                   atol=1e-6)

    def test_any_hit_and_live_prefix(self, scene):
        from bifrost3d_tpu.geometry.pallas_bvh_vmem import (
            BLOCK_R, vmem_intersect)
        tri, packed = scene
        o, d = _rays(4 * BLOCK_R, seed=3)
        ref = intersect_triangles_brute(tri, o, d, 1e-4, jnp.inf)
        occ = vmem_intersect(packed, o, d, 1e-4, jnp.inf, any_hit=True,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(occ.prim >= 0),
                                      np.asarray(ref.prim >= 0))
        part = vmem_intersect(packed, o, d, 1e-4, jnp.inf, interpret=True,
                              live_count=jnp.int32(BLOCK_R))
        np.testing.assert_array_equal(np.asarray(part.prim[:BLOCK_R]),
                                      np.asarray(ref.prim[:BLOCK_R]))
        assert np.all(np.asarray(part.prim[BLOCK_R:]) == -1)


class TestTreeletCut:
    """pack_hierarchical(cut=True): clusters are maximal ≤CLUSTER_T BVH
    subtrees (exact subtree boxes, degenerate-padded slots)."""

    def test_cut_matches_brute(self):
        tri = _soup(1700, seed=11)
        packed = pack_hierarchical(tri, cut=True)
        o, d = _rays(512, seed=12)
        hit = hierarchical_intersect(packed, o, d, 1e-4, jnp.inf,
                                     interpret=True)
        ref = intersect_triangles_brute(jnp.asarray(tri), o, d, 1e-4,
                                        jnp.inf)
        np.testing.assert_array_equal(np.asarray(hit.prim),
                                      np.asarray(ref.prim))
        np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                                   rtol=1e-4, atol=1e-5)

    def test_cut_covers_all_triangles_once(self):
        tri = _soup(2300, seed=13)
        packed = pack_hierarchical(tri, cut=True)
        order = np.asarray(packed.order)
        comp = np.asarray(packed.tri_components)
        # Non-degenerate slots (any nonzero edge component) carry each
        # original triangle exactly once.
        live = (np.abs(comp[3:9]).sum(axis=0) > 0)[:order.shape[0]]
        ids = np.sort(order[live])
        np.testing.assert_array_equal(ids, np.arange(2300))

    def test_cut_any_hit(self):
        tri = _soup(1700, seed=11)
        packed = pack_hierarchical(tri, cut=True)
        o, d = _rays(512, seed=14)
        occ = hierarchical_intersect(packed, o, d, 1e-4, jnp.inf,
                                     any_hit=True, interpret=True)
        ref = intersect_triangles_brute(jnp.asarray(tri), o, d, 1e-4,
                                        jnp.inf)
        np.testing.assert_array_equal(np.asarray(occ.prim >= 0),
                                      np.asarray(ref.prim >= 0))
