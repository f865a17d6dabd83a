"""MXU table-lookup formulations vs direct indexing (ADVICE r3 #5).

The render path replaces TPU gathers with one-hot / hat-weight matmul
contractions (shading/fittings.py `_bilinear_2d`, MaterialArray.gather,
path_tracer._fetch_tri_attributes). These tests pin the claimed equivalence
against the straightforward gather forms on random tables and indices,
including boundary coordinates (0.0, 1.0) and exact grid points.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.shading.fittings import _bilinear_2d, _bilinear_2d_batch
from bifrost3d_tpu.scene.materials import MaterialArray


def _bilinear_gather(table, x, y):
    """4-tap gather bilinear with the same boundary-aligned convention."""
    table = np.asarray(table)
    ny, nx = table.shape
    fx = np.clip(x, 0.0, 1.0) * (nx - 1)
    fy = np.clip(y, 0.0, 1.0) * (ny - 1)
    x0 = np.clip(np.floor(fx).astype(np.int32), 0, nx - 2)
    y0 = np.clip(np.floor(fy).astype(np.int32), 0, ny - 2)
    tx = fx - x0
    ty = fy - y0
    return ((table[y0, x0] * (1 - tx) + table[y0, x0 + 1] * tx) * (1 - ty)
            + (table[y0 + 1, x0] * (1 - tx) + table[y0 + 1, x0 + 1] * tx) * ty)


def test_bilinear_2d_matches_gather_form():
    rng = np.random.default_rng(7)
    table = rng.random((32, 32), np.float32)
    x = rng.random(512).astype(np.float32)
    y = rng.random(512).astype(np.float32)
    # Boundary coords and exact grid points.
    x[:8] = [0.0, 1.0, 0.0, 1.0, 3 / 31, 17 / 31, 0.5, 31 / 31]
    y[:8] = [0.0, 0.0, 1.0, 1.0, 5 / 31, 17 / 31, 0.5, 30 / 31]
    got = np.asarray(_bilinear_2d(jnp.asarray(table), jnp.asarray(x),
                                  jnp.asarray(y)))
    want = _bilinear_gather(table, x, y)
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_bilinear_2d_exact_at_grid_points():
    rng = np.random.default_rng(11)
    table = rng.random((32, 32), np.float32)
    ix = np.arange(32)
    got = np.asarray(_bilinear_2d(jnp.asarray(table),
                                  jnp.asarray(ix / 31.0, jnp.float32),
                                  jnp.asarray(ix / 31.0, jnp.float32)))
    np.testing.assert_allclose(got, table[ix, ix], atol=2e-6)


def test_bilinear_2d_batch_matches_gather_form():
    rng = np.random.default_rng(13)
    table = rng.random((16, 16, 16, 2), np.float32)
    z = rng.integers(0, 16, 128).astype(np.int32)
    x = rng.random(128).astype(np.float32)
    y = rng.random(128).astype(np.float32)
    x[:4] = [0.0, 1.0, 0.5, 15 / 15]
    y[:4] = [1.0, 0.0, 0.5, 14 / 15]
    got = np.asarray(_bilinear_2d_batch(
        jnp.asarray(table), jnp.asarray(z), jnp.asarray(x), jnp.asarray(y)))
    want = np.stack([
        np.array([_bilinear_gather(table[z[i], :, :, c], x[i], y[i])
                  for i in range(128)]) for c in range(2)], axis=-1)
    np.testing.assert_allclose(got, want, atol=5e-6)


def _random_materials(m, rng):
    mats = []
    for i in range(m):
        mats.append(dict(
            shading_model=int(rng.integers(0, 3)),
            tint=tuple(rng.random(3)),
            roughness=float(rng.random()),
            specularity=float(rng.random()),
            metallic=float(rng.random()),
            coat=float(rng.random()),
            coat_roughness=float(rng.random()),
            coverage=float(rng.random()),
            emission=tuple(rng.random(3)),
            flags=int(rng.integers(0, 4)),
            tint_roughness_texture=int(rng.integers(-1, 4)),
            metallic_texture=int(rng.integers(-1, 4)),
            coverage_texture=int(rng.integers(-1, 4)),
        ))
    return MaterialArray.build(mats)


@pytest.mark.parametrize("m", [7, 600])  # one-hot path and >512 fallback
def test_material_gather_matches_direct_indexing(m):
    rng = np.random.default_rng(17)
    mats = _random_materials(m, rng)
    idx = jnp.asarray(rng.integers(0, m, 256).astype(np.int32))
    got = mats.gather(idx)
    for f in MaterialArray._fields:
        want = np.asarray(getattr(mats, f))[np.asarray(idx)]
        np.testing.assert_allclose(np.asarray(getattr(got, f)), want,
                                   atol=1e-6, err_msg=f)


def test_material_gather_clips_out_of_range():
    rng = np.random.default_rng(19)
    mats = _random_materials(5, rng)
    idx = jnp.asarray(np.array([-3, -1, 5, 7], np.int32))
    got = mats.gather(idx)
    want_rows = np.array([0, 0, 4, 4])
    np.testing.assert_allclose(np.asarray(got.tint),
                               np.asarray(mats.tint)[want_rows], atol=1e-6)
    # Texture ids must survive exactly (-1 = untextured must not decode to 0).
    np.testing.assert_array_equal(
        np.asarray(got.tint_roughness_texture),
        np.asarray(mats.tint_roughness_texture)[want_rows])


def test_fetch_tri_attributes_exact_int_roundtrip():
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        _fetch_tri_attributes, _fetch_tri_uv_mat)
    from bifrost3d_tpu.math.octahedral import octahedral_decode

    scene, _ = create_cornell_box()
    t = scene.tri_verts.shape[0]
    rng = np.random.default_rng(23)
    prim = jnp.asarray(rng.integers(0, t, 300).astype(np.int32))
    v, n, uv, tr, mat_idx = _fetch_tri_attributes(scene, prim)
    p = np.asarray(prim)
    np.testing.assert_allclose(np.asarray(v), np.asarray(scene.tri_verts)[p],
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(n), np.asarray(octahedral_decode(scene.tri_normals_oct))[p],
        atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mat_idx),
                                  np.asarray(scene.tri_material)[p])
    uv2, mat2 = _fetch_tri_uv_mat(scene, prim)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(scene.tri_uvs)[p],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mat2),
                                  np.asarray(scene.tri_material)[p])
