"""Hierarchical (log N) Pallas BVH traversal for large scenes.

The reference traces rays through a two-level Trbvh accel — per-mesh trees
under a top-level group — with one divergent stack per GPU thread
(OptiXRenderer/Renderer.cpp:161-182,470-477; rtTrace at
Shading/SimpleRGPs.cu:115). A per-lane stack is hostile to a vector
machine, so the TPU design raises the traversal granularity from *ray* to
*ray block*:

- Triangles are grouped into spatially coherent CLUSTER_T-sized clusters
  (SAH-leaf order, as in pallas_clustered.py) — the bottom level.
- A binned-SAH BVH is built over the cluster AABBs (leaf = 1 cluster) —
  the top level, typically 2·C−1 nodes for C clusters.
- The kernel walks that tree once per BLOCK_R ray block with a single
  scalar stack in SMEM. At each internal node both children are
  slab-tested against the whole block ([R,1] vector math); a child is
  descended iff ANY ray in the block can still be improved inside it, and
  children are pushed far-first using the block-min entry distance so the
  near subtree tightens ``best_t`` before the far one is considered.
- At a leaf, the cluster's triangles are DMA'd HBM→VMEM and
  Möller-Trumbore-tested densely against the block ([R, CLUSTER_T] VPU
  math — every executed instruction stays dense, divergence is paid only
  at block granularity).

Complexity per block is O(log C + touched clusters) instead of the linear
kernel's O(C) box tests, and the near-to-far ordering typically shrinks
"touched clusters" itself: camera/shadow wavefronts are pixel-coherent, so
a block's rays agree on which subtrees matter (SURVEY.md §7.3 hard part
#1; the north-star "BVH traversal as a Pallas kernel").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bifrost3d_tpu.geometry.traverse import Hit
from bifrost3d_tpu.geometry.pallas_intersect import _mt_block, _pad_to

BLOCK_R = 128     # rays per grid step (r4 sweep: 128 beats 256 by 28% on
                  # coherent and 10% on sorted-incoherent traces — finer
                  # blocks cull better; BASELINE.md)
GROUP_R = 32      # rays per independent traversal sub-group (sublane
                  # slice of the block; descent decisions at this
                  # granularity — BASELINE.md r4 sub-group sweep)
CLUSTER_T = 512   # triangles per cluster (= one DMA block)
STACK = 64        # block-shared traversal stack (depth-checked at build)
_BIG = 3.0e38


class HierTriangles(NamedTuple):
    """Host-side packing product (pytree: flows through jit/shard_map)."""

    tri_components: jnp.ndarray  # [16, T_pad] cluster-ordered (v0,e1,e2)
    node_boxes: jnp.ndarray      # [n_pad, 128] lanes 0-2 lo.xyz, 3-5 hi.xyz
    node_meta: jnp.ndarray       # [n_pad] int32: internal → right-child id;
                                 #   leaf → -(cluster_id + 1)
    order: jnp.ndarray           # [T_pad] int32 → original triangle ids
    n_tris: jnp.ndarray          # [] int32


# Cluster partition strategy: False = slice the SAH depth-first leaf order
# every CLUSTER_T triangles (full clusters, arbitrary cut points); True =
# cut the triangle BVH at maximal ≤CLUSTER_T subtrees (exact subtree
# AABBs, partially filled slots padded with degenerate triangles that
# Möller-Trumbore rejects via det = 0). Default True: despite ~0.6-0.75
# slot fill (wasted dense tests inside touched leaves), the tighter
# cluster boxes cut touched-leaf counts enough to win everywhere measured
# (r4: torus coherent 25.95 → 19.1 ms, sorted-incoherent 120.5 → 99.1 ms,
# glTF MaterialScene frame 591 → 540 ms; BASELINE.md).
TREELET_CUT = True


def _treelet_cut(bvh, max_size):
    """Cut the flattened DFS BVH at maximal subtrees of ≤ max_size prims.

    Returns (ranges [(start, count)], lo [k, 3], hi [k, 3]) in left-first
    DFS order — subtree prim ranges are contiguous because leaves are laid
    out depth-first.
    """
    a = np.asarray(bvh.node_a)
    cnt = np.asarray(bvh.node_count)
    nmin = np.asarray(bvh.node_min, np.float32)
    nmax = np.asarray(bvh.node_max, np.float32)
    n = len(a)
    start = np.zeros(n, np.int64)
    total = np.zeros(n, np.int64)
    stack = [(0, False)]
    while stack:
        node, processed = stack.pop()
        if cnt[node] > 0:
            start[node] = a[node]
            total[node] = cnt[node]
        elif processed:
            left, right = node + 1, a[node]
            start[node] = min(start[left], start[right])
            total[node] = total[left] + total[right]
        else:
            stack.append((node, True))
            stack.append((node + 1, False))
            stack.append((int(a[node]), False))
    ranges, lo, hi = [], [], []
    stack = [0]
    while stack:
        node = stack.pop()
        if total[node] <= max_size:
            ranges.append((int(start[node]), int(total[node])))
            lo.append(nmin[node])
            hi.append(nmax[node])
        else:
            stack.append(int(a[node]))   # right pushed first →
            stack.append(node + 1)       # left pops first (DFS order)
    return ranges, np.asarray(lo), np.asarray(hi)


def pack_hierarchical(tri_verts, bvh=None, cut=None,
                      cluster_t=None) -> HierTriangles:
    """[t, 3, 3] world-space triangles → cluster-BVH packing.

    Triangle order comes from the triangle SAH BVH's depth-first leaf order
    (``bvh.prim_indices``) so consecutive CLUSTER_T-sized groups are
    spatially tight; a second binned-SAH build over the cluster AABBs
    (leaf = 1 cluster) gives the top-level tree the kernel traverses.

    ``cut`` (default: module TREELET_CUT) switches the cluster partition
    to maximal ≤CLUSTER_T BVH subtrees — tighter cluster boxes at the
    price of partially filled (degenerate-padded) DMA blocks.

    ``cluster_t`` overrides the cluster size (default: module CLUSTER_T,
    the wavefront trace kernel's DMA block). The mesh megakernel packs
    with finer clusters: its 1024-ray blocks pay leaf tests as dense
    (cluster, 128) VPU math per sublane row, so cull granularity matters
    more than DMA count there.
    """
    from bifrost3d_tpu.geometry.bvh import build_bvh, build_bvh_boxes

    CLUSTER = CLUSTER_T if cluster_t is None else int(cluster_t)
    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    if bvh is None:
        flat = tv.reshape(-1, 3)
        idx = np.arange(flat.shape[0], dtype=np.int32).reshape(-1, 3)
        bvh = build_bvh(flat, idx)
    order = np.asarray(bvh.prim_indices, np.int32)
    assert order.shape[0] == t, (order.shape, t)
    if cut is None:
        cut = TREELET_CUT

    if cut and t > CLUSTER:
        ranges, c_lo, c_hi = _treelet_cut(bvh, CLUSTER)
        n_clusters = len(ranges)
        t_pad = n_clusters * CLUSTER
        slot_order = np.zeros(t_pad, np.int32)
        slot_valid = np.zeros(t_pad, bool)
        for i, (s, c) in enumerate(ranges):
            slot_order[i * CLUSTER:i * CLUSTER + c] = order[s:s + c]
            slot_valid[i * CLUSTER:i * CLUSTER + c] = True
        order = slot_order
        sorted_tv = np.zeros((t_pad, 3, 3), np.float32)
        sorted_tv[slot_valid] = tv[order[slot_valid]]
        # Padded slots stay all-zero: e1 = e2 = 0 ⇒ det = 0 ⇒ the kernel's
        # Möller-Trumbore marks them invalid; the id-range filter must
        # therefore admit every slot (n_tris = t_pad below).
        n_valid = t_pad
    else:
        cut = False
        sorted_tv = tv[order]
        t_pad = ((t + CLUSTER - 1) // CLUSTER) * CLUSTER
        n_clusters = t_pad // CLUSTER
        n_valid = t

    v0 = sorted_tv[:, 0]
    e1 = sorted_tv[:, 1] - sorted_tv[:, 0]
    e2 = sorted_tv[:, 2] - sorted_tv[:, 0]
    comp = np.concatenate([v0.T, e1.T, e2.T], axis=0)  # [9, *]
    comp = np.pad(comp, ((0, 16 - comp.shape[0]),
                         (0, t_pad - comp.shape[1])))

    if cut and t > CLUSTER:
        pass  # exact subtree AABBs already in c_lo/c_hi
    else:
        # Cluster AABBs (bottom level) recomputed from the slices.
        pts = np.pad(sorted_tv.reshape(-1, 3),
                     ((0, (t_pad - sorted_tv.shape[0]) * 3), (0, 0)),
                     mode="edge" if t else "constant")
        pts = pts.reshape(n_clusters, CLUSTER * 3, 3)
        c_lo = pts.min(axis=1)
        c_hi = pts.max(axis=1)
    cbvh = build_bvh_boxes(c_lo, c_hi, max_leaf=1)

    node_min = np.asarray(cbvh.node_min, np.float32)
    node_max = np.asarray(cbvh.node_max, np.float32)
    node_a = np.asarray(cbvh.node_a, np.int32)
    node_count = np.asarray(cbvh.node_count, np.int32)
    cluster_order = np.asarray(cbvh.prim_indices, np.int32)
    n_nodes = node_a.shape[0]

    if cbvh.max_depth + 1 > STACK:
        raise ValueError(
            f"cluster BVH depth {cbvh.max_depth} exceeds the kernel stack "
            f"({STACK}); pathological cluster layout")

    # Row-per-node box layout, 128 lanes to satisfy VMEM tiling; only lanes
    # 0-5 carry data. Dynamic SUBLANE indexing (row) lowers on Mosaic;
    # dynamic lane indexing does not. One extra row: the kernel probes
    # ``node + 1`` unconditionally, which for the last node is a (never-hit)
    # padding row.
    n_pad = ((n_nodes + 8) // 8) * 8
    boxes = np.zeros((n_pad, 128), np.float32)
    boxes[:, 0:3] = _BIG       # padding nodes: never hit
    boxes[:, 3:6] = -_BIG
    boxes[:n_nodes, 0:3] = node_min
    boxes[:n_nodes, 3:6] = node_max

    # One int32 per node: sign distinguishes internal (right-child id ≥ 1,
    # the root is never a child) from leaf (-(cluster_id + 1)).
    meta = np.zeros(n_pad, np.int32)
    is_leaf = node_count > 0
    meta[:n_nodes] = np.where(is_leaf,
                              -(cluster_order[node_a * is_leaf] + 1),
                              node_a)

    order_pad = np.pad(order, (0, t_pad - order.shape[0]),
                       constant_values=0)
    return HierTriangles(
        tri_components=jnp.asarray(comp),
        node_boxes=jnp.asarray(boxes),
        node_meta=jnp.asarray(meta),
        order=jnp.asarray(order_pad),
        n_tris=jnp.asarray(n_valid, jnp.int32),
    )


def _make_hier_kernel(any_hit: bool):
    def kernel(n_tris_ref, n_live_ref, meta_ref, rays_ref, boxes_ref,
               tris_hbm, t_out, prim_out, u_out, v_out, stack_ref, tri_buf,
               sem):
        """One grid step = one BLOCK_R ray block, walked as
        BLOCK_R/GROUP_R INDEPENDENT sub-groups on the sublane axis.

        Sub-group traversal (r4): descent decisions at GROUP_R-ray
        granularity cull far better on low-coherence ray sets than whole-
        block decisions, without paying more grid/launch overhead — the
        group slices are static sublane ranges of the same VMEM block, and
        the groups share the kernel's stack/DMA scratch sequentially.

        Groups whose rays lie entirely past the caller's LIVE PREFIX
        (``n_live`` — the pooled wavefront sorts inactive lanes last)
        write miss outputs and skip traversal entirely, so drained pool
        iterations cost O(live), not O(pool) (BASELINE.md r4).
        """
        n_tris = n_tris_ref[0]
        block_start = pl.program_id(0) * BLOCK_R

        o_full = (rays_ref[0, :][:, None], rays_ref[1, :][:, None],
                  rays_ref[2, :][:, None])
        d_full = (rays_ref[3, :][:, None], rays_ref[4, :][:, None],
                  rays_ref[5, :][:, None])
        t_min_full = rays_ref[6, :][:, None]
        t_max_full = rays_ref[7, :][:, None]

        def safe_inv(x):
            mag = jnp.maximum(jnp.abs(x), 1e-12)
            return jnp.where(x < 0, -1.0, 1.0) / mag

        inv_d_full = tuple(safe_inv(c) for c in d_full)

        # Progressive best state lives in the output refs.
        t_out[:, 0] = jnp.minimum(t_max_full, _BIG)[:, 0]
        prim_out[:, 0] = jnp.full((BLOCK_R,), -1, jnp.int32)
        u_out[:, 0] = jnp.zeros((BLOCK_R, ), jnp.float32)
        v_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)

        def walk_group(g):
            lo_r, hi_r = g * GROUP_R, (g + 1) * GROUP_R
            o = tuple(c[lo_r:hi_r] for c in o_full)
            d = tuple(c[lo_r:hi_r] for c in d_full)
            inv_d = tuple(c[lo_r:hi_r] for c in inv_d_full)
            t_min = t_min_full[lo_r:hi_r]
            t_max = t_max_full[lo_r:hi_r]

            def probe(node):
                """Slab-test node's box against the group. Returns
                (any_improving, group-min entry distance)."""
                best_t = t_out[lo_r:hi_r, :]

                def axis_near_far(k):
                    lo = boxes_ref[pl.ds(node, 1), pl.ds(k, 1)]   # [1, 1]
                    hi = boxes_ref[pl.ds(node, 1), pl.ds(k + 3, 1)]
                    t0 = (lo - o[k]) * inv_d[k]                   # [G, 1]
                    t1 = (hi - o[k]) * inv_d[k]
                    return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

                n0, f0 = axis_near_far(0)
                n1, f1 = axis_near_far(1)
                n2, f2 = axis_near_far(2)
                near = jnp.maximum(jnp.maximum(n0, n1),
                                   jnp.maximum(n2, t_min))
                far = jnp.minimum(jnp.minimum(f0, f1), f2)
                hit = (near <= far) & (far > 0.0) & (near < best_t)
                near_est = jnp.min(jnp.where(hit, near, _BIG))
                return jnp.any(hit), near_est

            def leaf_test(cluster):
                """DMA one cluster's triangles, fold into the running best."""
                dma = pltpu.make_async_copy(
                    tris_hbm.at[:, pl.ds(cluster * CLUSTER_T, CLUSTER_T)],
                    tri_buf, sem)
                dma.start()
                dma.wait()
                tri = tri_buf[...]
                t, u, v, valid = _mt_block(o, d, tri, t_min)
                best = t_out[lo_r:hi_r, :]
                tri_ids = (cluster * CLUSTER_T
                           + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1))
                valid = valid & (tri_ids < n_tris) & (t < best) & (t < t_max)
                t = jnp.where(valid, t, _BIG)
                row_best = jnp.min(t, axis=1, keepdims=True)
                closer = row_best < best
                is_min = (t == row_best) & valid
                col = jnp.min(jnp.where(is_min, tri_ids,
                                        jnp.int32(0x7FFFFFFF)),
                              axis=1, keepdims=True)
                pick_u = jnp.max(jnp.where(is_min & (tri_ids == col), u,
                                           -_BIG), axis=1, keepdims=True)
                pick_v = jnp.max(jnp.where(is_min & (tri_ids == col), v,
                                           -_BIG), axis=1, keepdims=True)
                t_out[lo_r:hi_r, :] = jnp.where(closer, row_best, best)
                prim_out[lo_r:hi_r, :] = jnp.where(
                    closer, col, prim_out[lo_r:hi_r, :])
                u_out[lo_r:hi_r, :] = jnp.where(closer, pick_u,
                                                u_out[lo_r:hi_r, :])
                v_out[lo_r:hi_r, :] = jnp.where(closer, pick_v,
                                                v_out[lo_r:hi_r, :])
                if any_hit:
                    # Occlusion query: freeze hit lanes (near ≥ t_min =
                    # their new best ⇒ further box tests fail for them).
                    t_out[lo_r:hi_r, :] = jnp.where(
                        prim_out[lo_r:hi_r, :] >= 0, t_min,
                        t_out[lo_r:hi_r, :])

            def cond(sp):
                return sp > 0

            def body(sp):
                node = stack_ref[sp - 1]
                sp = sp - 1
                meta = meta_ref[node]
                is_leaf = meta < 0

                @pl.when(is_leaf)
                def _():
                    improving, _ = probe(node)

                    @pl.when(improving)
                    def _():
                        leaf_test(-meta - 1)

                # Internal: probe both children, push improving far-first.
                left = node + 1
                right = meta
                any_l, near_l = probe(left)
                any_r, near_r = probe(jnp.maximum(right, 0))
                push_l = jnp.logical_and(jnp.logical_not(is_leaf), any_l)
                push_r = jnp.logical_and(jnp.logical_not(is_leaf), any_r)
                swap = near_l > near_r       # far child pushed first
                first = jnp.where(swap, right, left)
                second = jnp.where(swap, left, right)
                push_first = jnp.where(swap, push_r, push_l)
                push_second = jnp.where(swap, push_l, push_r)
                stack_ref[sp] = second
                sp = sp + jnp.where(push_second, 1, 0)
                stack_ref[sp] = first
                sp = sp + jnp.where(push_first, 1, 0)
                if any_hit:
                    sp = jnp.where(
                        jnp.all(prim_out[lo_r:hi_r, :] >= 0), 0, sp)
                return sp

            group_live = block_start + g * GROUP_R < n_live_ref[0]

            @pl.when(group_live)
            def _():
                stack_ref[0] = jnp.int32(0)  # root pre-pushed
                jax.lax.while_loop(cond, body, jnp.int32(1))

        for g in range(BLOCK_R // GROUP_R):
            walk_group(g)

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def hierarchical_intersect(packed: HierTriangles, origin, direction,
                           t_min, t_max, any_hit: bool = False,
                           interpret: bool = False,
                           live_count=None) -> Hit:
    """Nearest hit (or any-hit occlusion) via block-level BVH traversal.

    ``live_count`` (traced i32, optional): rays at index ≥ live_count are
    known-inactive (the pooled wavefront's sorted prefix); their blocks
    skip traversal and report misses.

    Same contract as ``pallas_intersect``: returned prim ids are ORIGINAL
    triangle indices (the cluster reorder is undone host-side). With
    ``any_hit`` the returned t/u/v of hit lanes are unspecified — only
    ``prim >= 0`` is meaningful — and whole-block early exit applies.
    """
    r = origin.shape[0]
    r_pad = ((r + BLOCK_R - 1) // BLOCK_R) * BLOCK_R
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    rays = jnp.concatenate([
        origin.T, direction.T, t_min[None], t_max[None]], axis=0)
    rays = _pad_to(rays, r_pad, axis=1)

    grid = (r_pad // BLOCK_R,)
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
    ]
    block_out = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    if live_count is None:
        live_arr = jnp.asarray([r_pad], jnp.int32)
    else:
        live_arr = jnp.asarray(live_count, jnp.int32).reshape(1)
    t, prim, u, v = pl.pallas_call(
        _make_hier_kernel(any_hit),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_tris
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_live
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node_meta
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),   # node boxes
            pl.BlockSpec(memory_space=pl.ANY),    # triangles (HBM)
        ],
        out_specs=[block_out] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((16, CLUSTER_T), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray([packed.n_tris], jnp.int32), live_arr,
      packed.node_meta, rays, packed.node_boxes, packed.tri_components)

    t = t[:r, 0]
    prim_local = prim[:r, 0]
    miss = prim_local < 0
    prim = jnp.where(miss, -1, packed.order[jnp.maximum(prim_local, 0)])
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim,
               u=jnp.where(miss, 0.0, u[:r, 0]),
               v=jnp.where(miss, 0.0, v[:r, 0]))


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def hierarchical_intersect_sorted(packed: HierTriangles, origin, direction,
                                  t_min, t_max, any_hit: bool = False,
                                  interpret: bool = False) -> Hit:
    """:func:`hierarchical_intersect` behind an origin-Morton +
    direction-octant pre-sort (results scattered back to input order).

    The kernel's block-level culling assumes the 256-ray blocks agree on
    which subtrees matter; incoherent ray sets (bounce waves, random
    benchmarks) break that and collapse it to the linear scan. Sorting by
    quantized origin + octant restores block coherence — the standalone
    counterpart of the pooled wavefront's in-loop pool sort
    (path_tracer.render_pixels_pooled, SURVEY §7.3 #1).
    """
    from bifrost3d_tpu.math.morton import morton_encode_3d

    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    lo = packed.node_boxes[0, 0:3]
    hi = packed.node_boxes[0, 3:6]
    # 6 bits/axis: the r4 sweep (BASELINE.md) measured 3-6 bits within 3%
    # of each other — the sort itself is the win — with 6 marginally best.
    scale = 63.0 / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((origin - lo) * scale, 0.0, 63.0).astype(jnp.uint32)
    m = morton_encode_3d(q[:, 0], q[:, 1], q[:, 2])
    octant = ((direction[:, 0] < 0).astype(jnp.uint32) * 4
              + (direction[:, 1] < 0).astype(jnp.uint32) * 2
              + (direction[:, 2] < 0).astype(jnp.uint32))
    order = jnp.argsort(((m << jnp.uint32(3)) | octant).astype(jnp.int32),
                        stable=True)
    hit = hierarchical_intersect(packed, origin[order], direction[order],
                                 t_min[order], t_max[order],
                                 any_hit=any_hit, interpret=interpret)
    inverse = jnp.argsort(order)
    return Hit(t=hit.t[inverse], prim=hit.prim[inverse],
               u=hit.u[inverse], v=hit.v[inverse])
