"""Ray–triangle and ray–BVH intersection, wavefront-vectorized.

The reference's per-thread ``rtTrace`` (SURVEY.md §3.2 hot loop) maps to a
lockstep stack-based traversal: every ray in the wavefront keeps a small
fixed stack and all rays advance one node per iteration of a
``lax.while_loop`` — terminated lanes idle until the slowest lane finishes
(SURVEY.md §7.3 hard part #1; Pallas kernel iteration comes later, this is
the correctness baseline and already fuses into one XLA program).

Also provides a dense rays × triangles brute-force path: on TPU the VPU eats
dense intersection math, so for meshes below a few thousand triangles brute
force beats divergent traversal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.geometry.bvh import BVH, MAX_LEAF_SIZE

STACK_SIZE = 64
_BIG = np.float32(3.4e38)


class Hit(NamedTuple):
    t: jnp.ndarray       # [...] distance (inf on miss)
    prim: jnp.ndarray    # [...] int32 triangle id (-1 on miss)
    u: jnp.ndarray       # [...] barycentric u (of vertex 1)
    v: jnp.ndarray       # [...] barycentric v (of vertex 2)

    @property
    def mask(self):
        return jnp.isfinite(self.t)


def moller_trumbore(origin, direction, v0, v1, v2, eps=1e-9):
    """Möller–Trumbore over broadcastable ray/tri batches.

    origin/direction [..., 3] vs v0/v1/v2 [..., 3] (already broadcast).
    Returns (t, u, v, hit_mask); double-sided (backface culling is the
    integrator's job, matching the reference's attitude).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = ((jnp.abs(det) > eps) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t > 0.0))
    return t, u, v, hit


BRUTE_FORCE_MAX_TRIS = 4096   # below this, dense testing beats traversal
_BRUTE_CHUNK = 512


def intersect_triangles_brute(triangles, origin, direction,
                              t_min=1e-4, t_max=jnp.inf) -> Hit:
    """Dense rays × all-triangles nearest hit.

    triangles: [t, 3, 3] vertex positions. origin/direction: [r, 3].
    On TPU the VPU eats this: for meshes below a few thousand triangles the
    dense [rays × tris] Möller–Trumbore beats divergent traversal outright.
    Triangles are processed in chunks to bound the O(r·chunk) intermediate.
    """
    r = origin.shape[0]
    n_tris = triangles.shape[0]
    best = Hit(
        t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)),
        prim=jnp.full(r, -1, jnp.int32),
        u=jnp.zeros(r), v=jnp.zeros(r))
    o = origin[:, None, :]
    d = direction[:, None, :]
    for start in range(0, n_tris, _BRUTE_CHUNK):
        chunk = triangles[start:start + _BRUTE_CHUNK]
        t, u, v, hit = moller_trumbore(
            o, d, chunk[None, :, 0], chunk[None, :, 1], chunk[None, :, 2])
        valid = hit & (t > t_min) & (t < best.t[:, None])
        t = jnp.where(valid, t, jnp.inf)
        k = jnp.argmin(t, axis=1)
        t_new = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        closer = t_new < best.t
        sel = lambda arr: jnp.take_along_axis(arr, k[:, None], axis=1)[:, 0]
        best = Hit(
            t=jnp.where(closer, t_new, best.t),
            prim=jnp.where(closer, (k + start).astype(jnp.int32), best.prim),
            u=jnp.where(closer, sel(u), best.u),
            v=jnp.where(closer, sel(v), best.v))
    miss = best.prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, best.t), prim=best.prim,
               u=best.u, v=best.v)


# Dense streaming beats traversal up to surprisingly large scenes on TPU:
# the Pallas kernel sustains ~30-46 G ray-tri tests/s on v5e (measured:
# 65k rays x 2.2k tris in 4.9 ms = 9.6x the XLA brute path, 270x the
# lockstep BVH, with identical hits).
PALLAS_MAX_TRIS = 65536


def _use_pallas(tri_components, n_rays) -> bool:
    import jax
    return (tri_components is not None
            and jax.default_backend() == "tpu"
            and tri_components.shape[1] <= PALLAS_MAX_TRIS
            and n_rays >= 256)


def intersect_scene(bvh: BVH, triangles, origin, direction,
                    t_min=1e-4, t_max=jnp.inf, any_hit: bool = False,
                    tri_components=None, tri_clustered=None,
                    live_count=None) -> Hit:
    """Strategy dispatch (static under jit, so the choice costs nothing):

    - TPU + small scene → dense Pallas streaming kernel
      (geometry/pallas_intersect.py).
    - TPU + large scene → hierarchical block-BVH Pallas kernel
      (geometry/pallas_bvh.py); the linear cluster-culled kernel
      (geometry/pallas_clustered.py) remains as a measured-against
      baseline and accepted packing.
    - small meshes elsewhere → dense XLA brute force (CPU tests, fallback).
    - beyond → lockstep BVH traversal.
    """
    import jax
    on_tpu = jax.default_backend() == "tpu"
    if (tri_clustered is not None and on_tpu and origin.shape[0] >= 256):
        from bifrost3d_tpu.geometry.pallas_bvh import (
            HierTriangles, hierarchical_intersect)
        from bifrost3d_tpu.geometry.pallas_bvh_vmem import (
            VmemTriangles, vmem_intersect)
        if isinstance(tri_clustered, VmemTriangles):
            return vmem_intersect(tri_clustered, origin, direction,
                                  t_min, t_max, any_hit=any_hit,
                                  live_count=live_count)
        if isinstance(tri_clustered, HierTriangles):
            return hierarchical_intersect(tri_clustered, origin, direction,
                                          t_min, t_max, any_hit=any_hit,
                                          live_count=live_count)
        from bifrost3d_tpu.geometry.pallas_clustered import clustered_intersect
        return clustered_intersect(tri_clustered, origin, direction,
                                   t_min, t_max)
    if _use_pallas(tri_components, origin.shape[0]):
        from bifrost3d_tpu.geometry.pallas_intersect import pallas_intersect
        return pallas_intersect(tri_components, triangles.shape[0],
                                origin, direction, t_min, t_max,
                                live_count=live_count)
    if triangles.shape[0] <= BRUTE_FORCE_MAX_TRIS:
        return intersect_triangles_brute(triangles, origin, direction,
                                         t_min, t_max)
    return intersect_bvh(bvh, triangles, origin, direction, t_min, t_max,
                         any_hit=any_hit)


def intersect_scene_any(bvh: BVH, triangles, origin, direction,
                        t_min=1e-4, t_max=jnp.inf, tri_components=None,
                        tri_clustered=None, live_count=None):
    hit = intersect_scene(bvh, triangles, origin, direction, t_min, t_max,
                          any_hit=True, tri_components=tri_components,
                          tri_clustered=tri_clustered, live_count=live_count)
    return hit.prim >= 0


def _aabb_hit(origin, inv_dir, lo, hi, t_max):
    """Slab test: does the ray segment [0, t_max] hit AABB (lo, hi)?"""
    t0 = (lo - origin) * inv_dir
    t1 = (hi - origin) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max), t_near


def _leaf_test(bvh: BVH, triangles, origin, direction, offset, count,
               t_min, best):
    """Test up to MAX_LEAF_SIZE triangles of one leaf per ray (masked)."""
    ks = jnp.arange(MAX_LEAF_SIZE, dtype=jnp.int32)
    prim_slot = offset[:, None] + ks[None, :]
    in_leaf = ks[None, :] < count[:, None]
    prim_ids = bvh.prim_indices[jnp.clip(prim_slot, 0, bvh.prim_indices.shape[0] - 1)]
    tris = triangles[prim_ids]                           # [r, K, 3, 3]
    t, u, v, hit = moller_trumbore(
        origin[:, None, :], direction[:, None, :],
        tris[:, :, 0], tris[:, :, 1], tris[:, :, 2])
    valid = hit & in_leaf & (t > t_min) & (t < best.t[:, None])
    t = jnp.where(valid, t, jnp.inf)
    k_best = jnp.argmin(t, axis=1)
    t_new = jnp.take_along_axis(t, k_best[:, None], axis=1)[:, 0]
    closer = t_new < best.t
    sel = lambda arr: jnp.take_along_axis(arr, k_best[:, None], axis=1)[:, 0]
    return Hit(
        t=jnp.where(closer, t_new, best.t),
        prim=jnp.where(closer, sel(prim_ids), best.prim),
        u=jnp.where(closer, sel(u), best.u),
        v=jnp.where(closer, sel(v), best.v),
    )


def intersect_bvh(bvh: BVH, triangles, origin, direction,
                  t_min=1e-4, t_max=jnp.inf, any_hit: bool = False) -> Hit:
    """Nearest-hit (or any-hit) BVH traversal for rays [r, 3].

    triangles: [t, 3, 3] gathered vertex positions (``positions[indices]``).
    Lockstep: each while_loop iteration pops one node per active ray.
    """
    r = origin.shape[0]
    # Clamp tiny components so the slab test stays NaN-free (conservative:
    # a near-axis-parallel ray sees slightly fat slabs, never thin ones).
    d_safe = jnp.where(jnp.abs(direction) < 1e-12,
                       jnp.where(direction < 0, -1e-12, 1e-12), direction)
    inv_dir = 1.0 / d_safe

    stack = jnp.zeros((r, STACK_SIZE), jnp.int32)
    sp = jnp.ones(r, jnp.int32)  # root pre-pushed at slot 0
    best = Hit(
        t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)),
        prim=jnp.full(r, -1, jnp.int32),
        u=jnp.zeros(r), v=jnp.zeros(r))

    def cond(state):
        _, sp, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best = state
        active = sp > 0
        top = jnp.clip(sp - 1, 0, STACK_SIZE - 1)
        node = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)
        sp = jnp.where(active, sp - 1, sp)

        lo = bvh.node_min[node]
        hi = bvh.node_max[node]
        box_hit, _ = _aabb_hit(origin, inv_dir, lo, hi, best.t)
        box_hit = box_hit & active
        is_leaf = bvh.node_count[node] > 0

        # Leaf: test triangles.
        do_leaf = box_hit & is_leaf
        leaf_best = _leaf_test(bvh, triangles, origin, direction,
                               bvh.node_a[node], bvh.node_count[node],
                               t_min, best)
        best = Hit(*(jnp.where(do_leaf, n, o)
                     for n, o in zip(leaf_best, best)))
        if any_hit:
            # Occlusion query: a hit empties the lane's stack.
            found = best.prim >= 0
            sp = jnp.where(found, 0, sp)

        # Internal: push both children (left = node + 1, right = node_a).
        push = box_hit & ~is_leaf
        left = node + 1
        right = bvh.node_a[node]
        slot0 = jnp.clip(sp, 0, STACK_SIZE - 1)
        stack = _scatter_row(stack, slot0, jnp.where(push, right, _gather_row(stack, slot0)))
        sp = jnp.where(push, jnp.minimum(sp + 1, STACK_SIZE), sp)
        slot1 = jnp.clip(sp, 0, STACK_SIZE - 1)
        stack = _scatter_row(stack, slot1, jnp.where(push, left, _gather_row(stack, slot1)))
        sp = jnp.where(push, jnp.minimum(sp + 1, STACK_SIZE), sp)
        return stack, sp, best

    _, _, best = jax.lax.while_loop(cond, body, (stack, sp, best))
    miss = best.prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, best.t), prim=best.prim,
               u=best.u, v=best.v)


def intersect_bvh_any(bvh: BVH, triangles, origin, direction,
                      t_min=1e-4, t_max=jnp.inf):
    """Occlusion query: True where ANY triangle lies in (t_min, t_max)."""
    hit = intersect_bvh(bvh, triangles, origin, direction, t_min, t_max,
                        any_hit=True)
    return hit.prim >= 0


def _gather_row(arr, col):
    return jnp.take_along_axis(arr, col[:, None], axis=1)[:, 0]


def _scatter_row(arr, col, val):
    return jax.vmap(lambda row, c, x: row.at[c].set(x))(arr, col, val)
