"""Two-level clustered Pallas intersector for large scenes.

Scales the streaming kernel (pallas_intersect.py) past the dense O(R·T)
wall: triangles are reordered into spatially coherent clusters (BVH leaf
order from the SAH builder), each cluster gets an AABB, and the kernel
slab-tests every ray block against a cluster's box BEFORE deciding — with
``@pl.when`` on the block-level any-hit — whether to DMA and test that
cluster's triangles at all. Camera/shadow wavefronts are pixel-coherent,
so most blocks skip most clusters: the effective work per ray approaches
BVH-traversal complexity while every executed instruction stays dense
VPU math (no divergence, no gathers).

This is the TPU answer to the reference's Trbvh ``rtTrace``
(SURVEY.md §3.2 hot loop, §7.3 hard part #1).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bifrost3d_tpu.geometry.traverse import Hit
from bifrost3d_tpu.geometry.pallas_intersect import _mt_block, _pad_to

BLOCK_R = 256     # rays per grid step
CLUSTER_T = 512   # triangles per cluster (= one DMA block)
_BIG = 3.0e38


from typing import NamedTuple


class ClusteredTriangles(NamedTuple):
    """Host-side packing product (pytree: flows through jit/shard_map)."""

    tri_components: jnp.ndarray  # [16, T_pad] BVH-ordered components
    cluster_boxes: jnp.ndarray   # [C_pad, 128] lanes 0-2 lo.xyz, 3-5 hi.xyz
    order: jnp.ndarray           # [T_pad] int32 → original triangle ids
    n_tris: jnp.ndarray          # [] int32


def pack_clustered(tri_verts, bvh=None) -> ClusteredTriangles:
    """[t, 3, 3] world-space triangles → clustered packing.

    Triangle order comes from the SAH BVH's depth-first leaf order
    (``bvh.prim_indices``), so consecutive CLUSTER_T-sized groups are
    spatially tight; their AABBs are the level-1 culling structure.
    """
    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    if bvh is None:
        from bifrost3d_tpu.geometry.bvh import build_bvh
        flat = tv.reshape(-1, 3)
        idx = np.arange(flat.shape[0], dtype=np.int32).reshape(-1, 3)
        bvh = build_bvh(flat, idx)
    order = np.asarray(bvh.prim_indices, np.int32)
    assert order.shape[0] == t, (order.shape, t)
    sorted_tv = tv[order]

    t_pad = ((t + CLUSTER_T - 1) // CLUSTER_T) * CLUSTER_T
    n_clusters = t_pad // CLUSTER_T
    c_pad = ((n_clusters + 127) // 128) * 128

    v0 = sorted_tv[:, 0]
    e1 = sorted_tv[:, 1] - sorted_tv[:, 0]
    e2 = sorted_tv[:, 2] - sorted_tv[:, 0]
    comp = np.concatenate([v0.T, e1.T, e2.T], axis=0)  # [9, t]
    comp = np.pad(comp, ((0, 16 - comp.shape[0]), (0, t_pad - t)))

    # Row-per-cluster layout, 128 lanes to satisfy the VMEM tiling; only
    # lanes 0-5 carry data. Dynamic SUBLANE indexing (row c) lowers on
    # Mosaic; dynamic lane indexing does not.
    boxes = np.zeros((c_pad, 128), np.float32)
    boxes[:, 0:3] = _BIG     # lo of empty/padding clusters: never hit
    boxes[:, 3:6] = -_BIG
    for c in range(n_clusters):
        chunk = sorted_tv[c * CLUSTER_T:(c + 1) * CLUSTER_T]
        pts = chunk.reshape(-1, 3)
        boxes[c, 0:3] = pts.min(axis=0)
        boxes[c, 3:6] = pts.max(axis=0)

    order_pad = np.pad(order, (0, t_pad - t), constant_values=0)
    return ClusteredTriangles(
        tri_components=jnp.asarray(comp),
        cluster_boxes=jnp.asarray(boxes),
        order=jnp.asarray(order_pad),
        n_tris=jnp.asarray(t, jnp.int32),
    )


def _clustered_kernel(n_tris_ref, rays_ref, boxes_ref, tris_hbm,
                      t_out, prim_out, u_out, v_out, tri_buf, sem):
    """One grid step = one BLOCK_R ray block vs all clusters, culled."""
    n_clusters = tris_hbm.shape[1] // CLUSTER_T
    n_tris = n_tris_ref[0]

    o = (rays_ref[0, :][:, None], rays_ref[1, :][:, None], rays_ref[2, :][:, None])
    d = (rays_ref[3, :][:, None], rays_ref[4, :][:, None], rays_ref[5, :][:, None])
    t_min = rays_ref[6, :][:, None]
    t_max = rays_ref[7, :][:, None]

    def safe_inv(x):
        mag = jnp.maximum(jnp.abs(x), 1e-12)
        return jnp.where(x < 0, -1.0, 1.0) / mag

    inv_d = tuple(safe_inv(c) for c in d)

    # Progressive best state lives in the output refs.
    t_out[:, 0] = jnp.minimum(t_max, _BIG)[:, 0]
    prim_out[:, 0] = jnp.full((BLOCK_R,), -1, jnp.int32)
    u_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)
    v_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)

    def body(c, carry):
        best_t = t_out[:, :]  # [R, 1]

        def axis_near_far(k):
            lo = boxes_ref[pl.ds(c, 1), pl.ds(k, 1)]      # [1, 1]
            hi = boxes_ref[pl.ds(c, 1), pl.ds(k + 3, 1)]
            t0 = (lo - o[k]) * inv_d[k]                   # [R, 1]
            t1 = (hi - o[k]) * inv_d[k]
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        n0, f0 = axis_near_far(0)
        n1, f1 = axis_near_far(1)
        n2, f2 = axis_near_far(2)
        near = jnp.maximum(jnp.maximum(n0, n1), jnp.maximum(n2, t_min))
        far = jnp.minimum(jnp.minimum(f0, f1), f2)
        box_hit = (near <= far) & (far > 0.0) & (near < best_t)

        @pl.when(jnp.any(box_hit))
        def _():
            dma = pltpu.make_async_copy(
                tris_hbm.at[:, pl.ds(c * CLUSTER_T, CLUSTER_T)], tri_buf, sem)
            dma.start()
            dma.wait()
            tri = tri_buf[...]
            t, u, v, valid = _mt_block(o, d, tri, t_min)
            best = t_out[:, :]
            tri_ids = (c * CLUSTER_T
                       + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1))
            valid = valid & (tri_ids < n_tris) & (t < best) & (t < t_max)
            t = jnp.where(valid, t, _BIG)
            row_best = jnp.min(t, axis=1, keepdims=True)
            closer = row_best < best
            is_min = (t == row_best) & valid
            col = jnp.min(jnp.where(is_min, tri_ids, jnp.int32(0x7FFFFFFF)),
                          axis=1, keepdims=True)
            pick_u = jnp.max(jnp.where(is_min & (tri_ids == col), u, -_BIG),
                             axis=1, keepdims=True)
            pick_v = jnp.max(jnp.where(is_min & (tri_ids == col), v, -_BIG),
                             axis=1, keepdims=True)
            t_out[:, :] = jnp.where(closer, row_best, best)
            prim_out[:, :] = jnp.where(closer, col, prim_out[:, :])
            u_out[:, :] = jnp.where(closer, pick_u, u_out[:, :])
            v_out[:, :] = jnp.where(closer, pick_v, v_out[:, :])

        return carry

    jax.lax.fori_loop(0, n_clusters, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def clustered_intersect(packed: ClusteredTriangles, origin, direction,
                        t_min, t_max, interpret: bool = False) -> Hit:
    """Nearest hit via cluster-culled streaming. Same contract as
    :func:`pallas_intersect` (returned prim ids are ORIGINAL triangle
    indices — the BVH reorder is undone host-side)."""
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
    t, prim, u, v = pl.pallas_call(
        _clustered_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_tris
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cluster boxes
            pl.BlockSpec(memory_space=pl.ANY),    # triangles (HBM)
        ],
        out_specs=[block_out] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((16, CLUSTER_T), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray([packed.n_tris], jnp.int32), rays,
      packed.cluster_boxes, packed.tri_components)

    t = t[:r, 0]
    prim_local = prim[:r, 0]
    miss = prim_local < 0
    prim = jnp.where(miss, -1,
                     packed.order[jnp.maximum(prim_local, 0)])
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim,
               u=jnp.where(miss, 0.0, u[:r, 0]),
               v=jnp.where(miss, 0.0, v[:r, 0]))
