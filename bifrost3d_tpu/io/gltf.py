"""glTF 2.0 loader (.gltf and .glb), written fresh against the spec.

Counterpart of the reference's glTFLoader (``glTFLoader.cpp``, SURVEY.md
§2.6) with the same behavioral rules:
- triangles-only primitives with POSITION / NORMAL / TEXCOORD_0
  (glTFLoader.cpp:552-570); other topologies are skipped with a warning.
- node hierarchy with TRS or matrix transforms flattened into world space.
- material conversion: pbrMetallicRoughness base color → tint (+coverage
  from alpha), doubleSided → ThinWalled, alphaMode MASK → Cutout +
  threshold (glTFLoader.cpp:469-475), ``KHR_materials_clearcoat`` → coat.
- animations / cameras / skins / punctual lights ignored with warnings
  (glTFLoader.cpp:531-535, 697-699).
- image channel re-packing: glTF's (baseColor+coverage) + (metallic,
  roughness) textures are repacked into Bifrost's (tint, roughness) +
  metallic + coverage layout with caching — see ``_repack_textures``
  (glTFLoader.cpp:106-133, 174+).
"""

from __future__ import annotations

import base64
import json
import os
import struct
import warnings

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.geometry.mesh import TriangleMesh

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT4": 16}


def _load_glb(path):
    with open(path, "rb") as f:
        magic, _version, _length = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67, "not a glb file"
        json_data, bin_data = None, b""
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            chunk_len, chunk_type = struct.unpack("<II", header)
            chunk = f.read(chunk_len)
            if chunk_type == 0x4E4F534A:
                json_data = json.loads(chunk)
            elif chunk_type == 0x004E4942:
                bin_data = chunk
        return json_data, [bin_data]


def _load_gltf_json(path):
    with open(path) as f:
        doc = json.load(f)
    buffers = []
    base = os.path.dirname(path)
    for buf in doc.get("buffers", []):
        uri = buf.get("uri", "")
        if uri.startswith("data:"):
            buffers.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base, uri), "rb") as f:
                buffers.append(f.read())
    return doc, buffers


def _read_accessor(doc, buffers, accessor_index):
    acc = doc["accessors"][accessor_index]
    view = doc["bufferViews"][acc["bufferView"]]
    data = buffers[view.get("buffer", 0)]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    count = acc["count"]
    ncomp = _TYPE_COUNTS[acc["type"]]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride") or dtype().itemsize * ncomp
    itemsize = dtype().itemsize
    if stride == itemsize * ncomp:
        arr = np.frombuffer(data, dtype, count * ncomp, offset).reshape(count, ncomp)
    else:
        arr = np.zeros((count, ncomp), dtype)
        for i in range(count):
            arr[i] = np.frombuffer(data, dtype, ncomp, offset + i * stride)
    if acc.get("normalized"):
        arr = arr.astype(np.float32) / np.iinfo(dtype).max
    return np.array(arr)


def _node_matrix(node):
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(list(node["scale"]) + [1.0]).astype(np.float32)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.asarray([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y), 0],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x), 0],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y), 0],
            [0, 0, 0, 1]], np.float32)
        m = r @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def _convert_material(gmat, doc):
    """pbrMetallicRoughness → our material dict (glTFLoader.cpp:440-520)."""
    out = dict(tint=(1.0, 1.0, 1.0), roughness=1.0, metallic=1.0)
    pbr = gmat.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1, 1, 1, 1])
    out["tint"] = tuple(base[:3])
    out["coverage"] = base[3]
    out["roughness"] = pbr.get("roughnessFactor", 1.0)
    out["metallic"] = pbr.get("metallicFactor", 1.0)
    flags = 0
    if gmat.get("doubleSided"):
        flags |= 1  # ThinWalled (glTFLoader doubleSided rule)
    alpha_mode = gmat.get("alphaMode", "OPAQUE")
    if alpha_mode == "MASK":
        flags |= 2  # Cutout
        out["coverage"] = gmat.get("alphaCutoff", 0.5)
    elif alpha_mode == "OPAQUE":
        out["coverage"] = 1.0
    out["flags"] = flags
    clearcoat = gmat.get("extensions", {}).get("KHR_materials_clearcoat")
    if clearcoat:
        out["coat"] = clearcoat.get("clearcoatFactor", 0.0)
        out["coat_roughness"] = clearcoat.get("clearcoatRoughnessFactor", 0.0)
    emissive = gmat.get("emissiveFactor")
    if emissive and any(v > 0 for v in emissive):
        strength = gmat.get("extensions", {}).get(
            "KHR_materials_emissive_strength", {}).get("emissiveStrength", 1.0)
        out["emission"] = tuple(v * strength for v in emissive)
    # Surface texture references for the caller (repacking happens there).
    if "baseColorTexture" in pbr:
        out["tint_texture_index"] = pbr["baseColorTexture"]["index"]
    if "metallicRoughnessTexture" in pbr:
        out["metallic_roughness_texture_index"] = \
            pbr["metallicRoughnessTexture"]["index"]
    return out


def _load_gltf_image(doc, buffers, image_index, base_dir):
    """Decode a glTF image (uri file, data uri, or bufferView) → float [h,w,c]
    in [0,1], NOT yet linearized (caller decides per-channel semantics)."""
    import io as _io

    from PIL import Image as PILImage

    img = doc["images"][image_index]
    if "uri" in img:
        uri = img["uri"]
        if uri.startswith("data:"):
            raw = base64.b64decode(uri.split(",", 1)[1])
            pil = PILImage.open(_io.BytesIO(raw))
        else:
            pil = PILImage.open(os.path.join(base_dir, uri))
    else:
        view = doc["bufferViews"][img["bufferView"]]
        data = buffers[view.get("buffer", 0)]
        off = view.get("byteOffset", 0)
        pil = PILImage.open(_io.BytesIO(data[off:off + view["byteLength"]]))
    arr = np.asarray(pil).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def _repack_textures(doc, buffers, base_dir, material_dicts):
    """The reference's channel repacking (glTFLoader.cpp:106-133):
    glTF (baseColor rgb+a) + (metallicRoughness g=rough, b=metal) →
    (tint_roughness rgba) + metallic + coverage textures, cached per
    source-image pair. Returns (texture_dicts, updates material_dicts
    in place with bank indices)."""
    from bifrost3d_tpu.math.color import srgb_to_linear

    textures = []
    cache = {}

    def image_of(tex_index):
        return doc["textures"][tex_index].get("source", 0)

    def add_texture(image_array):
        textures.append(dict(image=image_array))
        return len(textures) - 1

    for m in material_dicts:
        base_idx = m.pop("tint_texture_index", None)
        mr_idx = m.pop("metallic_roughness_texture_index", None)
        key = (base_idx, mr_idx)
        if key == (None, None):
            continue
        if key not in cache:
            base = (_load_gltf_image(doc, buffers, image_of(base_idx), base_dir)
                    if base_idx is not None else None)
            mr = (_load_gltf_image(doc, buffers, image_of(mr_idx), base_dir)
                  if mr_idx is not None else None)
            h = base.shape[0] if base is not None else mr.shape[0]
            w = base.shape[1] if base is not None else mr.shape[1]
            # tint (sRGB→linear) + roughness (G of metallicRoughness).
            tr = np.ones((h, w, 4), np.float32)
            if base is not None:
                tr[..., :3] = np.asarray(srgb_to_linear(base[..., :3]))
            if mr is not None:
                if mr.shape[:2] != (h, w):
                    from PIL import Image as PILImage
                    mr = np.asarray(PILImage.fromarray(
                        (mr * 255).astype(np.uint8)).resize((w, h))).astype(np.float32) / 255.0
                    if mr.ndim == 2:
                        mr = mr[..., None]
                tr[..., 3] = mr[..., min(1, mr.shape[-1] - 1)]
            entry = {"tint_roughness": add_texture(tr)}
            if mr is not None:
                entry["metallic"] = add_texture(
                    mr[..., min(2, mr.shape[-1] - 1)][..., None])
            if base is not None and base.shape[-1] == 4:
                entry["coverage"] = add_texture(base[..., 3][..., None])
            cache[key] = entry
        entry = cache[key]
        m["tint_roughness_texture"] = entry["tint_roughness"]
        if "metallic" in entry:
            m["metallic_texture"] = entry["metallic"]
        if "coverage" in entry:
            m["coverage_texture"] = entry["coverage"]
        # Textured materials use the texture values scaled by factors —
        # glTF factors default to 1 and multiply, which our integrator
        # already does.
    return textures


def load_gltf(path, load_textures: bool = True):
    """→ (meshes, material_dicts) or (meshes, material_dicts, texture_dicts)
    with ``load_textures``; meshes = [(TriangleMesh, mat_idx, name)].

    Meshes arrive in world space (node hierarchy pre-flattened).
    """
    if path.lower().endswith(".glb"):
        doc, buffers = _load_glb(path)
    else:
        doc, buffers = _load_gltf_json(path)

    for ignored in ("animations", "skins", "cameras"):
        if doc.get(ignored):
            warnings.warn(f"glTF: ignoring {ignored} (not supported)")

    material_dicts = [
        _convert_material(g, doc) for g in doc.get("materials", [])]
    if not material_dicts:
        material_dicts = [dict(tint=(0.8, 0.8, 0.8), roughness=0.8)]

    texture_dicts = []
    if load_textures and doc.get("textures"):
        try:
            texture_dicts = _repack_textures(
                doc, buffers, os.path.dirname(path), material_dicts)
        except Exception as e:  # pragma: no cover - corrupt texture data
            warnings.warn(f"glTF: texture loading failed ({e})")

    meshes = []

    def emit_mesh(mesh_index, world, name):
        mesh = doc["meshes"][mesh_index]
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:
                warnings.warn("glTF: skipping non-triangle primitive")
                continue
            attrs = prim["attributes"]
            if "POSITION" not in attrs:
                continue
            pos = _read_accessor(doc, buffers, attrs["POSITION"]).astype(np.float32)
            pos = pos @ world[:3, :3].T + world[:3, 3]
            if "indices" in prim:
                idx = _read_accessor(doc, buffers, prim["indices"]).reshape(-1)
            else:
                idx = np.arange(len(pos))
            idx = idx.astype(np.int32).reshape(-1, 3)
            normals = None
            if "NORMAL" in attrs:
                n = _read_accessor(doc, buffers, attrs["NORMAL"]).astype(np.float32)
                inv_t = np.linalg.inv(world[:3, :3]).T
                n = n @ inv_t.T
                n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
                normals = jnp.asarray(n)
            uv = None
            if "TEXCOORD_0" in attrs:
                uv = jnp.asarray(_read_accessor(
                    doc, buffers, attrs["TEXCOORD_0"]).astype(np.float32)[:, :2])
            # Negative determinant (mirroring) flips winding.
            if np.linalg.det(world[:3, :3]) < 0:
                idx = idx[:, ::-1]
            meshes.append((TriangleMesh(
                indices=jnp.asarray(idx),
                positions=jnp.asarray(pos),
                normals=normals, texcoords=uv,
            ), prim.get("material", 0), name))

    def walk(node_index, parent):
        node = doc["nodes"][node_index]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            emit_mesh(node["mesh"], world, node.get("name", f"node{node_index}"))
        for child in node.get("children", []):
            walk(child, world)

    scene_index = doc.get("scene", 0)
    scenes = doc.get("scenes", [])
    roots = scenes[scene_index]["nodes"] if scenes else range(len(doc.get("nodes", [])))
    for root in roots:
        walk(root, np.eye(4, dtype=np.float32))

    if load_textures:
        return meshes, material_dicts, texture_dicts
    return meshes, material_dicts
