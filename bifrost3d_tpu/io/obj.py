"""Wavefront OBJ + MTL loader.

Counterpart of the reference's ObjLoader (``ObjLoader.cpp:32-315``,
SURVEY.md §2.6), written fresh against the OBJ text format:
- v/vn/vt/f parsing with negative indices and polygon fan triangulation.
- MTL conversion rules matching the reference: Blinn-Phong shininess →
  GGX roughness via ``alpha² = 2/(shininess+2)`` (ObjLoader.cpp:167-168),
  ``illum`` 3 or 5 → metallic = 1 (ObjLoader.cpp:169-171), ``d``/dissolve →
  coverage.

Returns (meshes, materials) where meshes is a list of
(TriangleMesh, material_index, name).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.geometry.mesh import TriangleMesh
from bifrost3d_tpu.scene.materials import DEFAULT_SPECULARITY


def _parse_mtl(path):
    materials = {}
    cur = None
    if not os.path.exists(path):
        return materials
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = dict(tint=(0.8, 0.8, 0.8), roughness=0.8,
                           specularity=DEFAULT_SPECULARITY)
                materials[parts[1]] = cur
            elif cur is None:
                continue
            elif key == "Kd":
                cur["tint"] = tuple(float(p) for p in parts[1:4])
            elif key == "Ke":
                e = tuple(float(p) for p in parts[1:4])
                if any(v > 0 for v in e):
                    cur["emission"] = e
            elif key == "Ns":
                # Blinn-Phong exponent → GGX alpha (ObjLoader.cpp:167-168).
                shininess = float(parts[1])
                alpha_sq = 2.0 / (shininess + 2.0)
                cur["roughness"] = float(np.sqrt(np.sqrt(alpha_sq)))
            elif key == "d":
                cur["coverage"] = float(parts[1])
            elif key == "Tr":
                cur["coverage"] = 1.0 - float(parts[1])
            elif key == "illum":
                if int(parts[1]) in (3, 5):
                    cur["metallic"] = 1.0  # ObjLoader.cpp:169-171
            elif key == "map_Kd":
                cur["tint_texture_path"] = parts[-1]
            elif key == "map_d":
                cur["coverage_texture_path"] = parts[-1]
    return materials


def _assemble_group(positions, normals, uvs, fl):
    """Shared mesh assembly: fl [t, 3, 3] of resolved (pos, uv, normal)
    corner indices (-1 = absent) → expanded TriangleMesh."""
    pos = positions[fl[..., 0]]                          # [t, 3, 3]
    n = normals[fl[..., 2]] if normals is not None and (fl[..., 2] >= 0).all() \
        else None
    uv = uvs[fl[..., 1]] if uvs is not None and (fl[..., 1] >= 0).all() else None
    t = fl.shape[0]
    idx = np.arange(3 * t, dtype=np.int32).reshape(t, 3)
    return TriangleMesh(
        indices=jnp.asarray(idx),
        positions=jnp.asarray(pos.reshape(-1, 3)),
        normals=None if n is None else jnp.asarray(n.reshape(-1, 3)),
        texcoords=None if uv is None else jnp.asarray(uv.reshape(-1, 2)),
    )


def _load_obj_native(path):
    """Fast path through the C++ tokenizer (native/obj_parser.cpp); returns
    None when the native library is unavailable."""
    from bifrost3d_tpu.io.native_obj import parse_obj_native
    raw = parse_obj_native(path)
    if raw is None:
        return None
    mtl = _parse_mtl(os.path.join(os.path.dirname(path), raw["mtllib"])) \
        if raw["mtllib"] else {}
    ids = raw["tri_material"]
    uniq, first_idx = np.unique(ids, return_index=True)
    order = uniq[np.argsort(first_idx)]
    material_dicts, meshes = [], []
    for mat_idx, mid in enumerate(order):
        name = None if mid < 0 else raw["material_names"][mid]
        material_dicts.append(mtl.get(
            name, dict(tint=(0.8, 0.8, 0.8), roughness=0.8)))
        fl = raw["tri_corners"][ids == mid].astype(np.int64)
        meshes.append((_assemble_group(raw["positions"], raw["normals"],
                                       raw["uvs"], fl),
                       mat_idx, name or "default"))
    return meshes, material_dicts


def load_obj(path, use_native: bool = True):
    """→ (meshes, material_dicts): meshes = [(TriangleMesh, mat_idx, name)]."""
    if use_native:
        result = _load_obj_native(path)
        if result is not None:
            return result
    positions, normals, uvs = [], [], []
    groups = {}  # material name -> list of face corner triples
    cur_mat = None
    mtl = {}

    def corner(token):
        vals = token.split("/")
        vi = int(vals[0])
        ti = int(vals[1]) if len(vals) > 1 and vals[1] else 0
        ni = int(vals[2]) if len(vals) > 2 and vals[2] else 0
        return vi, ti, ni

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(p) for p in parts[1:4]])
            elif key == "vn":
                normals.append([float(p) for p in parts[1:4]])
            elif key == "vt":
                uvs.append([float(p) for p in parts[1:3]])
            elif key == "mtllib":
                mtl.update(_parse_mtl(
                    os.path.join(os.path.dirname(path), parts[1])))
            elif key == "usemtl":
                cur_mat = parts[1]
            elif key == "f":
                corners = [corner(t) for t in parts[1:]]
                faces = groups.setdefault(cur_mat, [])
                for k in range(1, len(corners) - 1):  # fan triangulation
                    faces.append((corners[0], corners[k], corners[k + 1]))

    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32) if normals else None
    uvs = np.asarray(uvs, np.float32) if uvs else None

    def resolve(i, count):
        return i - 1 if i > 0 else count + i

    material_dicts = []
    mat_index = {}
    meshes = []
    for mat_name, faces in groups.items():
        if mat_name not in mat_index:
            mat_index[mat_name] = len(material_dicts)
            material_dicts.append(mtl.get(
                mat_name, dict(tint=(0.8, 0.8, 0.8), roughness=0.8)))
        fl = np.asarray(
            [[(resolve(c[0], len(positions)),
               resolve(c[1], len(uvs) if uvs is not None else 0) if c[1] else -1,
               resolve(c[2], len(normals) if normals is not None else 0) if c[2] else -1)
              for c in tri] for tri in faces], np.int64)   # [t, 3, 3]
        pos = positions[fl[..., 0]]                          # [t, 3, 3]
        n = normals[fl[..., 2]] if normals is not None and (fl[..., 2] >= 0).all() \
            else None
        uv = uvs[fl[..., 1]] if uvs is not None and (fl[..., 1] >= 0).all() else None
        t = fl.shape[0]
        idx = np.arange(3 * t, dtype=np.int32).reshape(t, 3)
        meshes.append((TriangleMesh(
            indices=jnp.asarray(idx),
            positions=jnp.asarray(pos.reshape(-1, 3)),
            normals=None if n is None else jnp.asarray(n.reshape(-1, 3)),
            texcoords=None if uv is None else jnp.asarray(uv.reshape(-1, 2)),
        ), mat_index[mat_name], mat_name or "default"))

    return meshes, material_dicts
