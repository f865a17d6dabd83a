"""Auxiliary output variables (AOVs).

Counterpart of the reference's AOV ray-gen programs
(``SimpleRGPs.cu:227-340``, SURVEY.md §2.4): depth (normalized by
near/far), albedo (= shading-model rho), tint, roughness, shading normal,
and primitive-ID (bit-reversed Morton coloring, Utils.h:304-329).
One primary-ray wavefront serves every AOV.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bifrost3d_tpu.geometry.traverse import intersect_scene
from bifrost3d_tpu.integrator.path_tracer import _create_shading
from bifrost3d_tpu.math.morton import morton_encode_2d
from bifrost3d_tpu.math.vec import dot, normalize, to_local
from bifrost3d_tpu.sampling.hashes import reverse_bits
from bifrost3d_tpu.scene.camera import PinholeCamera, camera_rays
from bifrost3d_tpu.scene.render_scene import RenderScene, corner_normals


@partial(jax.jit, static_argnames=("width", "height"))
def render_aovs(scene: RenderScene, camera: PinholeCamera,
                width: int, height: int, near: float = 0.1, far: float = 100.0):
    """→ dict of AOV images [h, w, ...] from one primary-ray pass."""
    origin, direction = camera_rays(camera, width, height)
    o = origin.reshape(-1, 3)
    d = direction.reshape(-1, 3)

    hit = intersect_scene(scene.bvh, scene.tri_verts, o, d,
                          tri_components=scene.tri_components,
                          tri_clustered=scene.tri_clustered,
                        t_min=scene.scene_epsilon)
    mask = hit.mask
    prim = jnp.maximum(hit.prim, 0)
    v = scene.tri_verts[prim]
    n = corner_normals(scene, prim)
    mat_idx = scene.tri_material[prim]
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
    shading_normal = normalize(jnp.einsum("rk,rkc->rc", bary, n))
    shading_normal = jnp.where(
        dot(shading_normal, d, keepdims=True) > 0, -shading_normal, shading_normal)

    # Depth normalized to [0, 1] by near/far (SimpleRGPs.cu:227-259).
    depth = jnp.clip((jnp.where(mask, hit.t, far) - near) / (far - near), 0.0, 1.0)

    mats_lane = scene.materials.gather(mat_idx)
    tint = mats_lane.tint
    roughness = mats_lane.roughness

    # Albedo = rho of the constructed shading model.
    wo = to_local(-d, shading_normal)
    bundle = _create_shading(mats_lane, wo[..., 2],
                             jnp.zeros_like(hit.t))
    abs_cos = jnp.abs(wo[..., 2])
    rho_default = bundle.default.rho(abs_cos)
    rho_diffuse = bundle.diffuse.rho(abs_cos)
    rho_trans = bundle.transmissive.rho(abs_cos)
    m = bundle.model[..., None]
    albedo = jnp.where(m == 1, rho_diffuse,
                       jnp.where(m == 2, rho_trans, rho_default))

    # Primitive ID: bit-reversed Morton-coded RGB (Utils.h:304-329).
    code = reverse_bits(prim.astype(jnp.uint32))
    r = (code >> jnp.uint32(0)) & jnp.uint32(0x3FF)
    g = (code >> jnp.uint32(10)) & jnp.uint32(0x3FF)
    b = (code >> jnp.uint32(20)) & jnp.uint32(0x3FF)
    prim_color = jnp.stack([r, g, b], axis=-1).astype(jnp.float32) / 1023.0

    def img(x, channels=None):
        shape = (height, width) if channels is None else (height, width, channels)
        return x.reshape(shape)

    zero3 = jnp.zeros_like(tint)
    return {
        "depth": img(depth),
        "albedo": img(jnp.where(mask[..., None], albedo, zero3), 3),
        "tint": img(jnp.where(mask[..., None], tint, zero3), 3),
        "roughness": img(jnp.where(mask, roughness, 0.0)),
        "shading_normal": img(
            jnp.where(mask[..., None], shading_normal, zero3), 3),
        "primitive_id": img(jnp.where(mask[..., None], prim_color, zero3), 3),
    }
