"""Pallas TPU kernel: fused ray × triangle nearest-hit intersection.

The hot op of the wavefront (SURVEY.md §3.2 ══ DEVICE BOUNDARY ══) as a
hand-written TPU kernel. Design notes (see pallas_guide.md):

- Rays live in VMEM for the whole kernel, laid out component-major
  ``[8, R]`` so each component is a natural (sublane × lane) tile row.
- Triangles stream from HBM in component-major blocks ``[16, BLOCK_T]``
  (9 live rows padded to the sublane tiling of 8) with double-buffered
  async DMA overlapping compute.
- The Möller-Trumbore test is evaluated as dense ``[BLOCK_R, BLOCK_T]``
  VPU math (broadcast [R,1] × [1,T]) — no gathers, no divergence; the
  per-ray argmin folds into a running (t, prim) minimum in VMEM.

This replaces the XLA brute-force path for big wavefronts; the lockstep
BVH traversal (geometry/traverse.py) remains for huge scenes until the
two-level clustered kernel lands.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bifrost3d_tpu.geometry.traverse import Hit

BLOCK_R = 256    # rays per grid step
BLOCK_T = 512    # triangles per DMA block
_EPS_DET = 1e-9
_BIG = 3.0e38  # plain float: pallas kernels must not capture array constants


def _mt_block(o, d, tri, t_min):
    """Möller-Trumbore for [R, 1] rays × [1, T] triangles → [R, T].

    o/d: tuples of 3 [R, 1] components; tri: [9, T] vertex components
    (v0.xyz, e1.xyz, e2.xyz pre-computed host-side).
    Returns (t, u, v, valid).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = tri[0][None, :], tri[1][None, :], tri[2][None, :]
    e1x, e1y, e1z = tri[3][None, :], tri[4][None, :], tri[5][None, :]
    e2x, e2y, e2z = tri[6][None, :], tri[7][None, :], tri[8][None, :]

    # pvec = d × e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _EPS_DET, 1.0, 0.0) / jnp.where(
        det == 0.0, 1.0, det)
    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec × e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = ((jnp.abs(det) > _EPS_DET) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > t_min))
    return t, u, v, valid


def _intersect_kernel(n_tris_ref, n_live_ref, rays_ref, tris_hbm, t_out,
                      prim_out, u_out, v_out, tri_buf, sem):
    """One grid step = one BLOCK_R ray block against ALL triangles.

    Blocks past the caller's live prefix (``n_live``, pooled-wavefront
    sorted order) write misses and skip the triangle stream entirely.
    """
    n_blocks = tris_hbm.shape[1] // BLOCK_T
    n_tris = n_tris_ref[0]
    block_live = pl.program_id(0) * BLOCK_R < n_live_ref[0]

    o = (rays_ref[0, :][:, None], rays_ref[1, :][:, None], rays_ref[2, :][:, None])
    d = (rays_ref[3, :][:, None], rays_ref[4, :][:, None], rays_ref[5, :][:, None])
    t_min = rays_ref[6, :][:, None]
    t_max = rays_ref[7, :][:, None]

    def get_dma(slot, block):
        return pltpu.make_async_copy(
            tris_hbm.at[:, pl.ds(block * BLOCK_T, BLOCK_T)],
            tri_buf.at[slot], sem.at[slot])

    @pl.when(block_live)
    def _():
        # Warm-up DMA only for live blocks: a started-but-unwaited copy
        # must not outlive the kernel instance.
        get_dma(0, 0).start()

    def body(block, state):
        best_t, best_prim, best_u, best_v = state
        slot = block % 2

        @pl.when(block + 1 < n_blocks)
        def _():
            get_dma((block + 1) % 2, block + 1).start()

        get_dma(slot, block).wait()
        tri = tri_buf[slot]
        t, u, v, valid = _mt_block(o, d, tri, t_min)

        # Mask padding triangles and apply the running-best / t_max bound.
        tri_ids = (block * BLOCK_T
                   + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1))
        valid = valid & (tri_ids < n_tris) & (t < best_t) & (t < t_max)
        t = jnp.where(valid, t, _BIG)
        row_best = jnp.min(t, axis=1, keepdims=True)
        closer = row_best < best_t
        # Column index of the row minimum (first match).
        is_min = (t == row_best) & valid
        col = jnp.min(jnp.where(is_min, tri_ids, jnp.int32(0x7FFFFFFF)),
                      axis=1, keepdims=True)
        pick_u = jnp.max(jnp.where(is_min & (tri_ids == col), u, -_BIG),
                         axis=1, keepdims=True)
        pick_v = jnp.max(jnp.where(is_min & (tri_ids == col), v, -_BIG),
                         axis=1, keepdims=True)
        best_prim = jnp.where(closer, col, best_prim)
        best_u = jnp.where(closer, pick_u, best_u)
        best_v = jnp.where(closer, pick_v, best_v)
        best_t = jnp.where(closer, row_best, best_t)
        return best_t, best_prim, best_u, best_v

    t_out[:, 0] = jnp.full((BLOCK_R,), _BIG, jnp.float32)
    prim_out[:, 0] = jnp.full((BLOCK_R,), -1, jnp.int32)
    u_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)
    v_out[:, 0] = jnp.zeros((BLOCK_R,), jnp.float32)

    @pl.when(block_live)
    def _():
        init = (jnp.full((BLOCK_R, 1), _BIG, jnp.float32),
                jnp.full((BLOCK_R, 1), -1, jnp.int32),
                jnp.zeros((BLOCK_R, 1), jnp.float32),
                jnp.zeros((BLOCK_R, 1), jnp.float32))
        best_t, best_prim, best_u, best_v = jax.lax.fori_loop(
            0, n_blocks, body, init)

        t_out[:, 0] = best_t[:, 0]
        prim_out[:, 0] = best_prim[:, 0]
        u_out[:, 0] = best_u[:, 0]
        v_out[:, 0] = best_v[:, 0]


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_intersect(tri_components, n_tris, origin, direction,
                     t_min, t_max, interpret: bool = False,
                     live_count=None) -> Hit:
    """Nearest hit of rays against the full triangle soup.

    tri_components: [16, T_padded] float32 (v0, e1, e2 component-major,
    padded to 16 rows),
    T_padded a multiple of BLOCK_T (see :func:`pack_triangles`).
    origin/direction: [r, 3]; t_min/t_max broadcastable [r].
    """
    r = origin.shape[0]
    r_pad = ((r + BLOCK_R - 1) // BLOCK_R) * BLOCK_R
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    rays = jnp.concatenate([
        origin.T, direction.T, t_min[None], t_max[None]], axis=0)  # [8, r]
    rays = _pad_to(rays, r_pad, axis=1)

    grid = (r_pad // BLOCK_R,)
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),   # t
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),     # prim
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),   # u
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),   # v
    ]
    block_out = pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    if live_count is None:
        live_arr = jnp.asarray([r_pad], jnp.int32)
    else:
        live_arr = jnp.asarray(live_count, jnp.int32).reshape(1)
    t, prim, u, v = pl.pallas_call(
        _intersect_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # n_tris
            pl.BlockSpec(memory_space=pltpu.SMEM),            # n_live
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # rays
            pl.BlockSpec(memory_space=pl.ANY),             # tris (HBM)
        ],
        out_specs=[block_out] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 16, BLOCK_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray([n_tris], jnp.int32), live_arr, rays, tri_components)

    t = t[:r, 0]
    prim = prim[:r, 0]
    miss = prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim,
               u=jnp.where(miss, 0.0, u[:r, 0]),
               v=jnp.where(miss, 0.0, v[:r, 0]))


def pack_triangles(tri_verts) -> tuple:
    """[t, 3, 3] vertex positions → ([16, T_pad] components, t).

    Precomputes (v0, e1, e2) component-major and pads to BLOCK_T so the
    kernel's DMA blocks are uniform.
    """
    tv = np.asarray(tri_verts, np.float32)
    t = tv.shape[0]
    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    comp = np.concatenate([v0.T, e1.T, e2.T], axis=0)  # [9, t]
    # Pad components to 16 rows: Mosaic requires slice dims aligned to the
    # (8, 128) tiling, and 9 sublanes are not.
    comp = np.pad(comp, ((0, 16 - comp.shape[0]), (0, 0)))
    t_pad = ((t + BLOCK_T - 1) // BLOCK_T) * BLOCK_T
    if t_pad > t:
        comp = np.pad(comp, ((0, 0), (0, t_pad - t)))
    return jnp.asarray(comp), t
