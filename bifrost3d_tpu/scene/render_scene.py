"""RenderScene: the device-resident scene bundle the integrator consumes.

The TPU-idiomatic replacement for the reference's ``handle_updates`` GPU
mirror (Renderer.cpp:578-1205): instead of diff-syncing mutable managers,
the host builds one immutable pytree of flattened world-space arrays —
triangle soup + BVH, material SoA, light SoA, environment tables — and the
jitted integrator closes over it. Scene edits rebuild the affected arrays
and reset the accumulation (SURVEY.md §7.2 step 6 "rebuild-and-donate").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.geometry.bvh import BVH, build_bvh
from bifrost3d_tpu.geometry.mesh import TriangleMesh, compute_smooth_normals
from bifrost3d_tpu.lights.environment import (
    EnvironmentLight,
    build_environment_light,
)
from bifrost3d_tpu.lights.types import LightArray
from bifrost3d_tpu.io.texture import TextureBank
from bifrost3d_tpu.scene.materials import MaterialArray
from bifrost3d_tpu.utils.hostbuild import host_build


class RenderScene(NamedTuple):
    # Flattened world-space triangle soup (positions gathered per corner).
    tri_verts: jnp.ndarray     # [t, 3, 3]
    # Shading normals per corner, OCTAHEDRAL-ENCODED int16 [t, 3, 2] — the
    # reference stores vertex normals the same way (Types.h:116-119,
    # OctahedralNormal.h); decode happens in the attribute-interpolation
    # stage (surface_normals). Halves normal HBM traffic vs f32x3.
    tri_normals_oct: jnp.ndarray
    tri_uvs: jnp.ndarray       # [t, 3, 2]
    tri_tint_roughness: jnp.ndarray  # [t, 3, 4] per-vertex (tint rgb, roughness) scale
    tri_material: jnp.ndarray  # [t] int32
    bvh: BVH
    materials: MaterialArray
    textures: TextureBank
    lights: LightArray
    environment: Optional[EnvironmentLight]  # None = tint-only background
    environment_tint: jnp.ndarray            # [3]
    scene_epsilon: jnp.ndarray               # scalar ray offset scale
    # Component-major packed (v0, e1, e2) for the Pallas streaming
    # intersector (geometry/pallas_intersect.py); None on scenes built by
    # hand in tests — intersect_scene then falls back to XLA paths.
    tri_components: Optional[jnp.ndarray] = None  # [16, T_pad]
    # Large-scene accel packing: HierTriangles (hierarchical block-BVH
    # kernel, geometry/pallas_bvh.py — the default) or ClusteredTriangles
    # (linear cluster-cull baseline, geometry/pallas_clustered.py).
    tri_clustered: Optional[object] = None
    # Presampled environment pool — the reference's DEFAULT env NEE path
    # (Defines.h:15, PresampledEnvironmentMap.cpp:19-101). Built when
    # ``presample_environment`` > 0; the integrator indexes the pool instead
    # of CDF-searching when RenderSettings.use_presampled_environment is set.
    environment_presampled: Optional[object] = None


def _assemble_soup(instances):
    """Flatten (mesh, material, matrix3x4) instances into world-space
    per-corner numpy arrays."""
    from bifrost3d_tpu.geometry.mesh import transform_mesh

    verts, normals, uvs, trs, mat_ids = [], [], [], [], []
    for inst in instances:
        mesh, mat_id = inst[0], inst[1]
        if len(inst) > 2 and inst[2] is not None:
            mesh = transform_mesh(mesh, inst[2])
        if mesh.normals is None:
            mesh = compute_smooth_normals(mesh)
        idx = np.asarray(mesh.indices)
        pos = np.asarray(mesh.positions)
        nrm = np.asarray(mesh.normals)
        uv = (np.asarray(mesh.texcoords) if mesh.texcoords is not None
              else np.zeros((pos.shape[0], 2), np.float32))
        tr = (np.asarray(mesh.tint_roughness)
              if mesh.tint_roughness is not None
              else np.ones((pos.shape[0], 4), np.float32))
        verts.append(pos[idx])
        normals.append(nrm[idx])
        uvs.append(uv[idx])
        trs.append(tr[idx])
        mat_ids.append(np.full(idx.shape[0], mat_id, np.int32))

    return (np.concatenate(verts).astype(np.float32),
            np.concatenate(normals).astype(np.float32),
            np.concatenate(uvs).astype(np.float32),
            np.concatenate(trs).astype(np.float32),
            np.concatenate(mat_ids))


@host_build
def build_render_scene(instances, materials: MaterialArray,
                       lights: Optional[LightArray] = None,
                       environment_map=None,
                       environment_tint=(0.0, 0.0, 0.0),
                       textures: Optional[TextureBank] = None,
                       presample_environment: int = 0) -> RenderScene:
    """instances: list of (TriangleMesh, material_index) or
    (TriangleMesh, material_index, matrix3x4)."""
    tri_verts, tri_normals, tri_uvs, tri_tr, tri_material = \
        _assemble_soup(instances)

    # Finite-table precondition: the integrator fetches attributes through
    # one-hot/hat-weight matmuls, where a single NaN/Inf row (degenerate
    # asset) poisons every lane via 0·Inf (ADVICE r3). Reject at build time.
    for name, arr in (("positions", tri_verts), ("normals", tri_normals),
                      ("texcoords", tri_uvs), ("tint_roughness", tri_tr)):
        if not np.all(np.isfinite(arr)):
            raise ValueError(f"scene {name} contain non-finite values")

    # Build the BVH over the flattened soup.
    flat_pos = tri_verts.reshape(-1, 3)
    flat_idx = np.arange(flat_pos.shape[0], dtype=np.int32).reshape(-1, 3)
    bvh = build_bvh(flat_pos, flat_idx)

    if lights is None:
        lights = LightArray.build([])

    env = None
    env_pool = None
    if environment_map is not None:
        env = build_environment_light(environment_map, tint=(1.0, 1.0, 1.0))
        if presample_environment:
            from bifrost3d_tpu.lights.environment import presample_environment \
                as _presample
            env_pool = _presample(env, presample_environment)

    extent = float(np.max(flat_pos.max(axis=0) - flat_pos.min(axis=0))) \
        if flat_pos.size else 1.0

    from bifrost3d_tpu.math.octahedral import octahedral_encode

    return RenderScene(
        tri_verts=jnp.asarray(tri_verts),
        tri_normals_oct=octahedral_encode(_safe_unit(tri_normals)),
        tri_uvs=jnp.asarray(tri_uvs),
        tri_tint_roughness=jnp.asarray(tri_tr),
        tri_material=jnp.asarray(tri_material),
        bvh=bvh,
        materials=materials,
        textures=textures if textures is not None else TextureBank.build([]),
        lights=lights,
        environment=env,
        environment_tint=jnp.asarray(environment_tint, jnp.float32),
        scene_epsilon=jnp.asarray(max(extent, 1e-3) * 1e-4, jnp.float32),
        tri_components=_packed_components(tri_verts),
        tri_clustered=_packed_clusters(tri_verts, bvh),
        environment_presampled=env_pool,
    )


@host_build
def refit_render_scene(scene: RenderScene, instances) -> RenderScene:
    """Transform-only scene update: rebuild the world-space soup and REFIT
    the existing BVH topology (geometry/bvh.py refit_bvh) instead of a SAH
    rebuild — the reference's refit-able top-level accel on transform
    change (Renderer.cpp:1010-1041, VERDICT r3 #7). Materials, textures,
    lights, and environment buffers are reused by identity.

    ``instances`` must bind the SAME meshes in the same order as the
    original build (only the matrices may differ) — asserted via the
    triangle count.
    """
    from bifrost3d_tpu.geometry.bvh import refit_bvh
    from bifrost3d_tpu.math.octahedral import octahedral_encode

    tri_verts, tri_normals, tri_uvs, tri_tr, tri_material = \
        _assemble_soup(instances)
    if tri_verts.shape[0] != int(scene.tri_verts.shape[0]):
        raise ValueError("refit requires identical instance topology; "
                         "rebuild instead")

    flat_pos = tri_verts.reshape(-1, 3)
    flat_idx = np.arange(flat_pos.shape[0], dtype=np.int32).reshape(-1, 3)
    bvh = refit_bvh(scene.bvh, flat_pos, flat_idx)

    extent = float(np.max(flat_pos.max(axis=0) - flat_pos.min(axis=0))) \
        if flat_pos.size else 1.0
    return scene._replace(
        tri_verts=jnp.asarray(tri_verts),
        tri_normals_oct=octahedral_encode(_safe_unit(tri_normals)),
        tri_uvs=jnp.asarray(tri_uvs),
        tri_tint_roughness=jnp.asarray(tri_tr),
        tri_material=jnp.asarray(tri_material),
        bvh=bvh,
        scene_epsilon=jnp.asarray(max(extent, 1e-3) * 1e-4, jnp.float32),
        tri_components=_packed_components(tri_verts),
        tri_clustered=_packed_clusters(tri_verts, bvh),
    )


def _safe_unit(n: np.ndarray) -> np.ndarray:
    """Normalize host-side; degenerate (zero) normals become +Z so the
    octahedral encode stays NaN-free."""
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    unit = np.divide(n, norm, out=np.zeros_like(n), where=norm > 1e-20)
    unit[..., 2] = np.where(norm[..., 0] > 1e-20, unit[..., 2], 1.0)
    return unit


def corner_normals(scene: RenderScene, prim):
    """Decoded per-corner shading normals [..., 3, 3] of triangles ``prim``
    (the attribute-interpolation decode, Types.h:58-70)."""
    from bifrost3d_tpu.math.octahedral import octahedral_decode
    return octahedral_decode(scene.tri_normals_oct[prim])


def _packed_components(tri_verts) -> jnp.ndarray:
    from bifrost3d_tpu.geometry.pallas_intersect import pack_triangles
    from bifrost3d_tpu.geometry.traverse import PALLAS_MAX_TRIS
    if tri_verts.shape[0] > PALLAS_MAX_TRIS:
        return None  # large scene: the clustered packing takes over
    comp, _ = pack_triangles(tri_verts)
    return comp


def _packed_clusters(tri_verts, bvh):
    # The DMA-streaming hierarchical kernel wins at every scale measured;
    # a VMEM-resident variant (pallas_bvh_vmem.py) was measured SLOWER on
    # the glTF MaterialScene (see BASELINE.md negative results) and is not
    # dispatched by default.
    from bifrost3d_tpu.geometry.pallas_bvh import pack_hierarchical
    from bifrost3d_tpu.geometry.traverse import PALLAS_MAX_TRIS
    if tri_verts.shape[0] <= PALLAS_MAX_TRIS:
        return None  # small scene: dense streaming is faster
    return pack_hierarchical(tri_verts, bvh)
