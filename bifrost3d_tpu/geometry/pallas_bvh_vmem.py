"""VMEM-resident hierarchical traversal for MID-SIZE scenes.

The DMA-streaming hierarchical kernel (pallas_bvh.py) pays, per touched
cluster, a synchronous 32 KB HBM→VMEM copy plus a dense ray×512-triangle
test — on divergent bounce waves both dominate (BASELINE.md r4 in-situ
profile: ~520 µs per 128-ray block on the glTF MaterialScene).

Scenes up to ~190k triangles fit entirely in VMEM (16 MB/core), so this
variant removes the DMA altogether and shrinks the per-leaf waste:

- Triangles are stored COMPONENT-PLANAR ``[16, T_pad/128, 128]``: one
  fully dense lane row per 128 triangles per component, so the VMEM
  footprint is the exact 64 B/triangle (a naive ``[T, 16]`` layout tiles
  the 16-lane rows up to 128 — an 8× VMEM blowup that OOMs the core).
- A leaf is one dynamic SUBLANE slice per component — the direction
  Mosaic can index dynamically — assembled into the same ``[16, 128]``
  component-major block the streaming kernel's ``_mt_block`` consumes,
  one 128-triangle chunk at a time (CLUSTER_T / 128 chunks per leaf).

Same packing contract as HierTriangles otherwise (SAH leaf order, cluster
BVH, live-prefix skipping, sub-group walks).

MEASURED NEGATIVE RESULT (kept as a tested, dispatchable variant but NOT
the default): on the glTF MaterialScene (177k tris, 512², 4 bounces, one
real TPU chip) this kernel runs 713 ms/frame at CLUSTER_T=512 and
781 ms/frame at CLUSTER_T=128, vs 591 ms/frame for the DMA-streaming
kernel (pallas_bvh.py) on identical ray pools. The 9 dynamic sublane
slices + relayout per 128-triangle chunk cost more than the single
32 KB async copy they replace, and the copy was never the bottleneck —
the dense ray×triangle test dominates either way. Dispatch stays with
pack_hierarchical (scene/render_scene.py _packed_clusters); this module
remains importable for explicit use and regression parity tests.
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

BLOCK_R = 128      # rays per grid step
GROUP_R = 32       # rays per independent traversal sub-group
CLUSTER_T = 512    # triangles per leaf (4 lane rows per component,
                   # tested as 4 sequential 128-wide chunks)
STACK = 64
_BIG = 3.0e38

# VMEM budget for the resident triangle table (leaves headroom for rays,
# node boxes, and outputs out of ~16 MB/core).
VMEM_TRI_BYTES = 12 * 1024 * 1024


class VmemTriangles(NamedTuple):
    """Host-side packing product (pytree: flows through jit/shard_map)."""

    tri_planes: jnp.ndarray   # [16, T_pad/128, 128] component-planar
    node_boxes: jnp.ndarray   # [n_pad, 128] lanes 0-2 lo.xyz, 3-5 hi.xyz
    node_meta: jnp.ndarray    # [n_pad] int32: internal → right child;
                              #   leaf → -(cluster_id + 1)
    order: jnp.ndarray        # [T_pad] int32 → original triangle ids
    n_tris: jnp.ndarray       # [] int32


def fits_vmem(n_tris: int) -> bool:
    t_pad = ((n_tris + CLUSTER_T - 1) // CLUSTER_T) * CLUSTER_T
    return t_pad * 16 * 4 <= VMEM_TRI_BYTES


def pack_vmem(tri_verts, bvh=None) -> VmemTriangles:
    """[t, 3, 3] world-space triangles → VMEM-resident packing (SAH leaf
    order, CLUSTER_T-sized leaves, cluster-BVH top level)."""
    from bifrost3d_tpu.geometry.bvh import build_bvh, build_bvh_boxes

    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    if bvh is None:
        flat = tv.reshape(-1, 3)
        idx = np.arange(flat.shape[0], dtype=np.int32).reshape(-1, 3)
        bvh = build_bvh(flat, idx)
    order = np.asarray(bvh.prim_indices, np.int32)
    assert order.shape[0] == t, (order.shape, t)
    sorted_tv = tv[order]

    t_pad = ((t + CLUSTER_T - 1) // CLUSTER_T) * CLUSTER_T
    n_clusters = t_pad // CLUSTER_T

    comp = np.zeros((16, t_pad), np.float32)
    comp[0:3, :t] = sorted_tv[:, 0].T
    comp[3:6, :t] = (sorted_tv[:, 1] - sorted_tv[:, 0]).T
    comp[6:9, :t] = (sorted_tv[:, 2] - sorted_tv[:, 0]).T
    planes = comp.reshape(16, t_pad // 128, 128)

    pts = np.pad(sorted_tv.reshape(-1, 3), ((0, (t_pad - t) * 3), (0, 0)),
                 mode="edge" if t else "constant")
    pts = pts.reshape(n_clusters, CLUSTER_T * 3, 3)
    cbvh = build_bvh_boxes(pts.min(axis=1), pts.max(axis=1), max_leaf=1)

    node_min = np.asarray(cbvh.node_min, np.float32)
    node_max = np.asarray(cbvh.node_max, np.float32)
    node_a = np.asarray(cbvh.node_a, np.int32)
    node_count = np.asarray(cbvh.node_count, np.int32)
    cluster_order = np.asarray(cbvh.prim_indices, np.int32)
    n_nodes = node_a.shape[0]
    if cbvh.max_depth + 1 > STACK:
        raise ValueError(f"cluster BVH depth {cbvh.max_depth} exceeds the "
                         f"kernel stack ({STACK})")

    n_pad = ((n_nodes + 8) // 8) * 8
    boxes = np.zeros((n_pad, 128), np.float32)
    boxes[:, 0:3] = _BIG
    boxes[:, 3:6] = -_BIG
    boxes[:n_nodes, 0:3] = node_min
    boxes[:n_nodes, 3:6] = node_max

    meta = np.zeros(n_pad, np.int32)
    is_leaf = node_count > 0
    meta[:n_nodes] = np.where(is_leaf,
                              -(cluster_order[node_a * is_leaf] + 1),
                              node_a)

    order_pad = np.pad(order, (0, t_pad - t), constant_values=0)
    return VmemTriangles(
        tri_planes=jnp.asarray(planes),
        node_boxes=jnp.asarray(boxes),
        node_meta=jnp.asarray(meta),
        order=jnp.asarray(order_pad),
        n_tris=jnp.asarray(t, jnp.int32),
    )


def _make_vmem_kernel(any_hit: bool):
    def kernel(n_tris_ref, n_live_ref, meta_ref, rays_ref, boxes_ref,
               tris_ref, t_out, prim_out, u_out, v_out, stack_ref):
        """One grid step = one BLOCK_R ray block, walked as
        BLOCK_R/GROUP_R independent sub-groups (see pallas_bvh.py); leaves
        are VMEM sublane slices — no DMA."""
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

        t_out[:, 0] = jnp.minimum(t_max_full, _BIG)[:, 0]
        prim_out[:, 0] = jnp.full((BLOCK_R,), -1, jnp.int32)
        u_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)
        v_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)

        def walk_group(g):
            lo_r, hi_r = g * GROUP_R, (g + 1) * GROUP_R
            o = tuple(c[lo_r:hi_r] for c in o_full)
            d = tuple(c[lo_r:hi_r] for c in d_full)
            inv_d = tuple(c[lo_r:hi_r] for c in inv_d_full)
            t_min = t_min_full[lo_r:hi_r]
            t_max = t_max_full[lo_r:hi_r]

            def probe(node):
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

            def leaf_chunk(cluster, sub):
                """[GROUP_R, 128] Möller-Trumbore on one VMEM row-chunk
                of the leaf (CLUSTER_T/128 chunks per leaf)."""
                row = cluster * (CLUSTER_T // 128) + sub
                tri = jnp.concatenate(
                    [tris_ref[c, pl.ds(row, 1), :] for c in range(9)],
                    axis=0)                                       # [9, 128]
                t, u, v, valid = _mt_block(o, d, tri, t_min)
                best = t_out[lo_r:hi_r, :]
                tri_ids = (cluster * CLUSTER_T + sub * 128
                           + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1))
                valid = valid & (tri_ids < n_tris) & (t < best) & (t < t_max)
                t = jnp.where(valid, t, _BIG)
                row_best = jnp.min(t, axis=1, keepdims=True)
                closer = row_best < best
                is_min = (t == row_best) & valid
                col = jnp.min(jnp.where(is_min, tri_ids,
                                        jnp.int32(0x7FFFFFFF)),
                              axis=1, keepdims=True)
                sel = is_min & (tri_ids == col)
                pick_u = jnp.max(jnp.where(sel, u, -_BIG), axis=1,
                                 keepdims=True)
                pick_v = jnp.max(jnp.where(sel, v, -_BIG), axis=1,
                                 keepdims=True)
                t_out[lo_r:hi_r, :] = jnp.where(closer, row_best, best)
                prim_out[lo_r:hi_r, :] = jnp.where(
                    closer, col, prim_out[lo_r:hi_r, :])
                u_out[lo_r:hi_r, :] = jnp.where(closer, pick_u,
                                                u_out[lo_r:hi_r, :])
                v_out[lo_r:hi_r, :] = jnp.where(closer, pick_v,
                                                v_out[lo_r:hi_r, :])
                if any_hit:
                    t_out[lo_r:hi_r, :] = jnp.where(
                        prim_out[lo_r:hi_r, :] >= 0, t_min,
                        t_out[lo_r:hi_r, :])

            def leaf_test(cluster):
                for sub in range(CLUSTER_T // 128):
                    leaf_chunk(cluster, sub)

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

                left = node + 1
                right = meta
                any_l, near_l = probe(left)
                any_r, near_r = probe(jnp.maximum(right, 0))
                push_l = jnp.logical_and(jnp.logical_not(is_leaf), any_l)
                push_r = jnp.logical_and(jnp.logical_not(is_leaf), any_r)
                swap = near_l > near_r
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
                stack_ref[0] = jnp.int32(0)
                jax.lax.while_loop(cond, body, jnp.int32(1))

        for g in range(BLOCK_R // GROUP_R):
            walk_group(g)

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def vmem_intersect(packed: VmemTriangles, origin, direction, t_min, t_max,
                   any_hit: bool = False, interpret: bool = False,
                   live_count=None) -> Hit:
    """Nearest hit (or any-hit occlusion) with the whole triangle table
    resident in VMEM. Same contract as hierarchical_intersect."""
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
        _make_vmem_kernel(any_hit),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_tris
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_live
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node_meta
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),   # node boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangles (RESIDENT)
        ],
        out_specs=[block_out] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray([packed.n_tris], jnp.int32), live_arr, packed.node_meta,
      rays, packed.node_boxes, packed.tri_planes)

    t = t[:r, 0]
    prim_local = prim[:r, 0]
    miss = prim_local < 0
    prim = jnp.where(miss, -1, packed.order[jnp.maximum(prim_local, 0)])
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim,
               u=jnp.where(miss, 0.0, u[:r, 0]),
               v=jnp.where(miss, 0.0, v[:r, 0]))
