"""I/O tests: image round-trips, comparison metrics (reference
ImageOperationsTests analogues), OBJ and glTF loading."""

import json
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.io import (
    load_exr,
    load_gltf,
    load_image,
    load_obj,
    mssim,
    rms,
    save_exr,
    save_image,
    ssim,
)


def hdr(seed=0, h=16, w=24):
    return np.random.default_rng(seed).random((h, w, 3)).astype(np.float32)


class TestImageIO:
    def test_exr_roundtrip(self, tmp_path):
        img = hdr(1) * 10.0
        p = str(tmp_path / "test.exr")
        save_exr(p, img)
        back = load_exr(p)
        np.testing.assert_array_equal(back, img)

    def test_png_roundtrip(self, tmp_path):
        img = hdr(2)
        p = str(tmp_path / "test.png")
        save_image(p, img)
        back = load_image(p)
        np.testing.assert_allclose(back, img, atol=1 / 128)


class TestCompare:
    def test_rms_identity_is_zero(self):
        img = hdr(3)
        assert rms(img, img) == 0.0

    def test_rms_scales_with_error(self):
        img = hdr(4)
        small = rms(img, img + 0.01)
        big = rms(img, img + 0.1)
        np.testing.assert_allclose(big / small, 10.0, rtol=1e-3)

    def test_ssim_identity_is_one(self):
        img = hdr(5)
        np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-4)
        assert ssim(img, 1.0 - img) < 0.8

    def test_mssim_identity_and_sensitivity(self):
        img = hdr(6, 24, 24)
        np.testing.assert_allclose(mssim(img, img, support=5), 1.0, atol=1e-4)
        noisy = img + np.random.default_rng(7).normal(0, 0.2, img.shape).astype(np.float32)
        assert mssim(img, noisy, support=5) < 0.97


class TestObjLoader:
    def test_load_cube_with_materials(self, tmp_path):
        mtl = """newmtl red
Kd 0.8 0.1 0.1
Ns 200
newmtl metal_mat
Kd 0.9 0.9 0.9
illum 3
"""
        obj = """mtllib cube.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl metal_mat
f 1/1/1 3/3/1 4/4/1
"""
        (tmp_path / "cube.mtl").write_text(mtl)
        p = tmp_path / "cube.obj"
        p.write_text(obj)
        meshes, mats = load_obj(str(p))
        assert len(meshes) == 2
        quad_mesh = meshes[0][0]
        assert quad_mesh.triangle_count == 2  # quad fan-triangulated
        assert meshes[1][0].triangle_count == 1
        # Material conversion rules.
        assert mats[0]["tint"] == (0.8, 0.1, 0.1)
        # Ns 200 → alpha² = 2/202 → roughness = (2/202)^(1/4).
        np.testing.assert_allclose(
            mats[0]["roughness"], (2.0 / 202.0) ** 0.25, rtol=1e-5)
        assert mats[1]["metallic"] == 1.0


def _minimal_gltf(tmp_path):
    """A single triangle with TRS node transform and a MASK material."""
    positions = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile([0, 0, 1.0], (3, 1)).astype(np.float32)
    indices = np.asarray([0, 1, 2], np.uint16)
    bin_data = positions.tobytes() + normals.tobytes() + indices.tobytes() + b"\0\0"
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1, 2, 3], "scale": [2, 2, 2]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.5, 0.4, 0.3, 1.0],
                "roughnessFactor": 0.25, "metallicFactor": 0.0},
            "doubleSided": True, "alphaMode": "MASK", "alphaCutoff": 0.4,
            "extensions": {"KHR_materials_clearcoat": {
                "clearcoatFactor": 1.0, "clearcoatRoughnessFactor": 0.1}}}],
        "buffers": [{"byteLength": len(bin_data), "uri": "data.bin"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"}],
    }
    (tmp_path / "data.bin").write_bytes(bin_data)
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


class TestGltfLoader:
    def test_load_with_trs_and_material(self, tmp_path):
        meshes, mats, _tex = load_gltf(_minimal_gltf(tmp_path))
        assert len(meshes) == 1
        mesh, mat_idx, _name = meshes[0]
        assert mesh.triangle_count == 1
        # TRS applied: scale 2 + translate (1,2,3).
        np.testing.assert_allclose(
            np.asarray(mesh.positions),
            [[1, 2, 3], [3, 2, 3], [1, 4, 3]], atol=1e-5)
        m = mats[mat_idx]
        assert m["tint"] == (0.5, 0.4, 0.3)
        assert m["roughness"] == 0.25
        assert m["flags"] == 1 | 2  # ThinWalled (doubleSided) + Cutout (MASK)
        assert m["coverage"] == 0.4  # cutoff threshold
        assert m["coat"] == 1.0

    def test_glb_roundtrip(self, tmp_path):
        # Re-pack the .gltf as .glb and load it.
        gltf_path = _minimal_gltf(tmp_path)
        with open(gltf_path) as f:
            doc = json.load(f)
        bin_data = (tmp_path / "data.bin").read_bytes()
        doc["buffers"] = [{"byteLength": len(bin_data)}]
        json_bytes = json.dumps(doc).encode()
        json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
        bin_pad = bin_data + b"\0" * ((4 - len(bin_data) % 4) % 4)
        glb = struct.pack("<III", 0x46546C67, 2,
                          12 + 8 + len(json_bytes) + 8 + len(bin_pad))
        glb += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
        glb += struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad
        p = tmp_path / "tri.glb"
        p.write_bytes(glb)
        meshes, mats, _tex = load_gltf(str(p))
        assert len(meshes) == 1
        assert meshes[0][0].triangle_count == 1


class TestNativeObjParser:
    """The C++ tokenizer (native/obj_parser.cpp) and the Python fallback
    must produce identical scenes — the lockstep test that licenses using
    the native fast path by default."""

    OBJ = """
mtllib parity.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl blue
f -4//-1 -3//-1 -2//-1
f 1 2 4
"""
    MTL = """
newmtl red
Kd 0.8 0.1 0.1
Ns 96
newmtl blue
Kd 0.1 0.1 0.9
illum 5
"""

    def test_native_matches_python(self, tmp_path):
        from bifrost3d_tpu.io.native_obj import native_available
        if not native_available():
            pytest.skip("no native toolchain")
        (tmp_path / "parity.mtl").write_text(self.MTL)
        p = tmp_path / "parity.obj"
        p.write_text(self.OBJ)
        mn, dn = load_obj(str(p), use_native=True)
        mp, dp = load_obj(str(p), use_native=False)
        assert dn == dp
        assert len(mn) == len(mp) == 2
        for (a, ia, na), (b, ib, nb) in zip(mn, mp):
            assert (ia, na) == (ib, nb)
            np.testing.assert_allclose(np.asarray(a.positions),
                                       np.asarray(b.positions))
            for buf in ("normals", "texcoords"):
                ba, bb = getattr(a, buf), getattr(b, buf)
                assert (ba is None) == (bb is None)
                if ba is not None:
                    np.testing.assert_allclose(np.asarray(ba), np.asarray(bb))

    def test_quad_fan_and_negative_indices(self, tmp_path):
        from bifrost3d_tpu.io.native_obj import parse_obj_native
        if parse_obj_native.__module__ is None:  # pragma: no cover
            pytest.skip("no native toolchain")
        p = tmp_path / "fan.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
        raw = parse_obj_native(str(p))
        if raw is None:
            pytest.skip("no native toolchain")
        assert raw["tri_corners"].shape == (2, 3, 3)
        np.testing.assert_array_equal(raw["tri_corners"][:, :, 0],
                                      [[0, 1, 2], [0, 2, 3]])
        assert (raw["tri_material"] == -1).all()
