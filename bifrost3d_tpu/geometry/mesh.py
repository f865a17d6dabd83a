"""Triangle-mesh struct-of-arrays + mesh utilities.

Counterpart of the reference's ``Assets/Mesh.h:24-293`` (SURVEY.md §2.3):
index buffer + SoA vertex buffers (positions, normals, texcoords, per-vertex
tint-roughness, per-vertex emission), AABB bounds, and the MeshUtils family
(compute_normals hard/smooth, transform, combine, expand, merge-duplicates,
winding checks, degenerate counting).

Host-side construction uses numpy (meshes are built/loaded once, then become
device arrays); everything returned is jnp so the pytree uploads wholesale.
Optional buffers are ``None`` — the pytree analogue of the reference's
``MeshFlags`` presence bitmask.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


class TriangleMesh(NamedTuple):
    indices: jnp.ndarray                    # [t, 3] int32
    positions: jnp.ndarray                  # [v, 3] float32
    normals: Optional[jnp.ndarray] = None   # [v, 3] float32 (unit)
    texcoords: Optional[jnp.ndarray] = None  # [v, 2] float32
    tint_roughness: Optional[jnp.ndarray] = None  # [v, 4] float32 (rgb + roughness)
    emission: Optional[jnp.ndarray] = None  # [v, 3] float32

    @property
    def triangle_count(self) -> int:
        return int(self.indices.shape[0])

    @property
    def vertex_count(self) -> int:
        return int(self.positions.shape[0])


def mesh_aabb(mesh: TriangleMesh):
    """(min, max) corner arrays — Mesh::compute_bounds."""
    return (jnp.min(mesh.positions, axis=0), jnp.max(mesh.positions, axis=0))


def _np(x):
    return np.asarray(x)


def compute_hard_normals(mesh: TriangleMesh) -> TriangleMesh:
    """Flat-shaded normals: expand the index buffer so each triangle owns
    its vertices, normal = face normal (MeshUtils::compute_hard_normals)."""
    m = expand_indexed_buffers(mesh)
    p = _np(m.positions).reshape(-1, 3, 3)
    n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    normals = np.repeat(n, 3, axis=0).astype(np.float32)
    return m._replace(normals=jnp.asarray(normals))


def compute_smooth_normals(mesh: TriangleMesh) -> TriangleMesh:
    """Area-weighted vertex normals (MeshUtils::compute_normals)."""
    idx = _np(mesh.indices)
    pos = _np(mesh.positions)
    face_n = np.cross(pos[idx[:, 1]] - pos[idx[:, 0]], pos[idx[:, 2]] - pos[idx[:, 0]])
    normals = np.zeros_like(pos)
    for k in range(3):
        np.add.at(normals, idx[:, k], face_n)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
    return mesh._replace(normals=jnp.asarray(normals.astype(np.float32)))


def transform_mesh(mesh: TriangleMesh, matrix3x4) -> TriangleMesh:
    """Apply an affine transform to positions (+ rotate normals) —
    MeshUtils::transform_mesh."""
    m = np.asarray(matrix3x4, np.float32)
    rot, trans = m[:, :3], m[:, 3]
    pos = _np(mesh.positions) @ rot.T + trans
    out = mesh._replace(positions=jnp.asarray(pos.astype(np.float32)))
    if mesh.normals is not None:
        inv_t = np.linalg.inv(rot).T
        n = _np(mesh.normals) @ inv_t.T
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        out = out._replace(normals=jnp.asarray(n.astype(np.float32)))
    return out


def combine_meshes(meshes) -> TriangleMesh:
    """Concatenate N meshes into one (MeshUtils::combine). Optional buffers
    present in any input are materialized with defaults in the rest."""
    any_normals = any(m.normals is not None for m in meshes)
    any_uv = any(m.texcoords is not None for m in meshes)
    any_tr = any(m.tint_roughness is not None for m in meshes)
    any_em = any(m.emission is not None for m in meshes)

    indices, positions, normals, uvs, trs, ems = [], [], [], [], [], []
    offset = 0
    for m in meshes:
        v = m.vertex_count
        indices.append(_np(m.indices) + offset)
        positions.append(_np(m.positions))
        if any_normals:
            normals.append(_np(m.normals) if m.normals is not None
                           else np.tile([0, 0, 1.0], (v, 1)))
        if any_uv:
            uvs.append(_np(m.texcoords) if m.texcoords is not None
                       else np.zeros((v, 2)))
        if any_tr:
            trs.append(_np(m.tint_roughness) if m.tint_roughness is not None
                       else np.tile([1, 1, 1, 1.0], (v, 1)))
        if any_em:
            ems.append(_np(m.emission) if m.emission is not None
                       else np.zeros((v, 3)))
        offset += v

    def cat(lst, dtype=np.float32):
        return jnp.asarray(np.concatenate(lst).astype(dtype))

    return TriangleMesh(
        indices=cat(indices, np.int32),
        positions=cat(positions),
        normals=cat(normals) if any_normals else None,
        texcoords=cat(uvs) if any_uv else None,
        tint_roughness=cat(trs) if any_tr else None,
        emission=cat(ems) if any_em else None,
    )


def expand_indexed_buffers(mesh: TriangleMesh) -> TriangleMesh:
    """Un-index: vertex i of triangle t becomes vertex 3t+i
    (MeshUtils::expand_indexed_buffer)."""
    idx = _np(mesh.indices).reshape(-1)
    new_idx = np.arange(idx.size, dtype=np.int32).reshape(-1, 3)

    def gather(buf):
        return None if buf is None else jnp.asarray(_np(buf)[idx])

    return TriangleMesh(
        indices=jnp.asarray(new_idx),
        positions=jnp.asarray(_np(mesh.positions)[idx]),
        normals=gather(mesh.normals),
        texcoords=gather(mesh.texcoords),
        tint_roughness=gather(mesh.tint_roughness),
        emission=gather(mesh.emission),
    )


def merge_duplicate_vertices(mesh: TriangleMesh, tolerance: float = 0.0) -> TriangleMesh:
    """Weld identical vertices (MeshUtils::merge_duplicate_vertices).

    Vertices merge when ALL present attributes match within tolerance
    (exact match for tolerance 0, via quantization otherwise).
    """
    parts = [_np(mesh.positions)]
    for buf in (mesh.normals, mesh.texcoords, mesh.tint_roughness, mesh.emission):
        if buf is not None:
            parts.append(_np(buf))
    key = np.concatenate(parts, axis=-1)
    if tolerance > 0:
        key = np.round(key / tolerance)
    _, first, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True)
    # Preserve original ordering of first occurrences.
    order = np.argsort(first)
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    remap = rank[inverse]
    keep = first[order]

    def gather(buf):
        return None if buf is None else jnp.asarray(_np(buf)[keep])

    return TriangleMesh(
        indices=jnp.asarray(remap[_np(mesh.indices)].astype(np.int32)),
        positions=jnp.asarray(_np(mesh.positions)[keep]),
        normals=gather(mesh.normals),
        texcoords=gather(mesh.texcoords),
        tint_roughness=gather(mesh.tint_roughness),
        emission=gather(mesh.emission),
    )


def normals_correspond_to_winding_order(mesh: TriangleMesh) -> bool:
    """True if vertex normals mostly agree with the CCW face normals."""
    idx = _np(mesh.indices)
    pos = _np(mesh.positions)
    n = _np(mesh.normals)
    face_n = np.cross(pos[idx[:, 1]] - pos[idx[:, 0]], pos[idx[:, 2]] - pos[idx[:, 0]])
    agree = 0.0
    for k in range(3):
        agree += np.sum(np.sum(face_n * n[idx[:, k]], axis=-1) > 0)
    return bool(agree >= 0.5 * 3 * idx.shape[0])


def count_degenerate_primitives(mesh: TriangleMesh, epsilon: float = 1e-10) -> int:
    """Triangles with (near-)zero area or repeated indices."""
    idx = _np(mesh.indices)
    pos = _np(mesh.positions)
    area2 = np.linalg.norm(
        np.cross(pos[idx[:, 1]] - pos[idx[:, 0]], pos[idx[:, 2]] - pos[idx[:, 0]]),
        axis=-1)
    repeated = ((idx[:, 0] == idx[:, 1]) | (idx[:, 1] == idx[:, 2])
                | (idx[:, 0] == idx[:, 2]))
    return int(np.sum((area2 <= epsilon) | repeated))
