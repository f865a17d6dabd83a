"""The preview frame pipeline: G-buffer → SSAO → direct light + IBL.

Counterpart of the DX11 frame pipeline (``DX11Renderer/Renderer.cpp:336-734``,
SURVEY.md §3.5): one primary-visibility pass builds the G-buffer, SSAO
modulates ambient/IBL, analytic lights shade with the sphere-light
most-representative-point approximation (LightSources.hlsl:28-155), and
shadows are a single hard shadow ray per light (the rasterizer has none;
this is strictly better and still one fused pass).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bifrost3d_tpu.bsdf.fresnel import schlick_fresnel
from bifrost3d_tpu.geometry.traverse import intersect_scene, intersect_scene_any
from bifrost3d_tpu.lights.types import LIGHT_DIRECTIONAL, LIGHT_SPHERE, LIGHT_SPOT
from bifrost3d_tpu.math.quaternion import quat_conjugate, quat_rotate
from bifrost3d_tpu.math.ray_offset import offset_ray_origin
from bifrost3d_tpu.math.vec import dot, normalize, reflect
from bifrost3d_tpu.sampling.distributions import INV_PI
from bifrost3d_tpu.scene.camera import PinholeCamera, camera_rays
from bifrost3d_tpu.scene.render_scene import RenderScene, corner_normals
from bifrost3d_tpu.shading.fittings import sample_ggx_rho, sample_ggx_with_fresnel_rho


def _light_contribution(scene, position, normal, wo, tint, roughness,
                        specularity, metallic):
    """Direct lighting: per light, most-representative-point spec + diffuse."""
    total = jnp.zeros_like(position)
    lights = scene.lights
    for li in range(lights.count):
        is_directional = lights.kind[li] == LIGHT_DIRECTIONAL
        is_spot = lights.kind[li] == LIGHT_SPOT
        to_light = lights.position[li] - position
        d2 = jnp.sum(jnp.square(to_light), axis=-1)
        dist_pt = jnp.sqrt(d2)
        # Distance floors are ~f32-denormal-scale, NOT absolute 1e-6: an
        # absolute floor silently clamps real distances in mm-scale scenes
        # and crushes the inverse-square falloff (found by the 1e-3×
        # scaled-room stress test, VERDICT r4 #9).
        dir_pt = to_light / jnp.maximum(dist_pt, 1e-18)[..., None]
        # Sphere as a point source with its total power (preview fidelity);
        # spot concentrates its power into the cone with a hard cutoff
        # (LightSources.hlsl:28-155 cone falloff); directional carries
        # radiance directly.
        rad_pt = lights.power[li] / (4.0 * jnp.pi * jnp.maximum(d2, 1e-30))[..., None]
        cos_to_axis = dot(lights.direction[li], -dir_pt)
        spot_norm = 2.0 * jnp.pi * jnp.maximum(1.0 - lights.cos_angle[li], 1e-6)
        rad_spot = jnp.where(
            (cos_to_axis > lights.cos_angle[li])[..., None],
            lights.power[li] / (spot_norm * jnp.maximum(d2, 1e-30))[..., None],
            0.0)
        l_dir = jnp.where(is_directional, -lights.direction[li], dir_pt)
        radiance = jnp.where(is_directional, lights.power[li],
                             jnp.where(is_spot, rad_spot, rad_pt))
        dist = jnp.where(is_directional, 1e30, dist_pt)
        n_dot_l = jnp.maximum(dot(normal, l_dir), 0.0)
        # Hard shadow ray — RT-Gems integer-ULP offset (math/ray_offset.py),
        # the same scale-robust origin the path tracer uses (VERDICT r4 #9).
        shadow_origin = offset_ray_origin(position, normal)
        occluded = intersect_scene_any(
            scene.bvh, scene.tri_verts, shadow_origin, l_dir,
            t_min=scene.scene_epsilon,
            t_max=jnp.minimum(dist * 0.999, 1e30),
            tri_components=scene.tri_components,
                      tri_clustered=scene.tri_clustered)
        # Diffuse + Blinn-ish GGX specular highlight.
        halfway = normalize(wo + l_dir)
        n_dot_h = jnp.maximum(dot(normal, halfway), 0.0)
        alpha = jnp.maximum(roughness * roughness, 1e-3)
        d_term = alpha**2 / (jnp.pi * jnp.square(n_dot_h**2 * (alpha**2 - 1) + 1) + 1e-6)
        base_spec = jnp.where(metallic[..., None] > 0.5, tint,
                              jnp.broadcast_to(specularity[..., None], tint.shape))
        fres = schlick_fresnel(base_spec, jnp.maximum(dot(halfway, l_dir), 0.0)[..., None])
        diffuse = tint * (1.0 - metallic[..., None]) * INV_PI
        spec = fres * (d_term / 4.0)[..., None]
        total = total + jnp.where(
            (occluded | (n_dot_l <= 0))[..., None], 0.0,
            radiance * n_dot_l[..., None] * (diffuse + spec))
    return total


def render_preview(scene: RenderScene, camera: PinholeCamera,
                   width: int, height: int, enable_ssao: bool = True,
                   ambient=(0.08, 0.08, 0.08)):
    """One preview frame → linear HDR [h, w, 3].

    Scenes with partial-coverage materials get a transparent pass — the
    ray-based analogue of the reference's back-to-front blended
    transparent-model pass (DX11Renderer/Renderer.cpp:681-734): up to
    ``_TRANSPARENT_LAYERS`` front-to-back peels accumulate
    ``T·α·shade`` with transmittance ``T ← T·(1−α)``, which is exactly
    sorted back-to-front alpha blending. Opaque-only scenes compile the
    single-pass pipeline (the static layer count keeps the cost zero)."""
    try:
        import numpy as _np
        transparent = bool(_np.any(
            _np.asarray(scene.materials.coverage) < 1.0))
    except Exception:  # traced scene under a caller's jit
        transparent = False
    layers = _TRANSPARENT_LAYERS if transparent else 1
    return _render_preview_impl(scene, camera, width, height,
                                enable_ssao, layers,
                                jnp.asarray(ambient, jnp.float32))


_TRANSPARENT_LAYERS = 4


@partial(jax.jit,
         static_argnames=("width", "height", "enable_ssao", "layers"))
def _render_preview_impl(scene: RenderScene, camera: PinholeCamera,
                         width: int, height: int, enable_ssao: bool,
                         layers: int, ambient):
    from bifrost3d_tpu.preview.ssao import bilateral_blur, ssao

    origin, direction = camera_rays(camera, width, height)
    o = origin.reshape(-1, 3)
    d = direction.reshape(-1, 3)

    color_acc = jnp.zeros_like(o)
    transmittance = jnp.ones(o.shape[0], jnp.float32)
    alive = jnp.ones(o.shape[0], bool)

    for layer in range(layers):
        hit = intersect_scene(scene.bvh, scene.tri_verts, o, d,
                              t_min=scene.scene_epsilon,
                              tri_components=scene.tri_components,
                              tri_clustered=scene.tri_clustered)
        mask = hit.mask & alive
        prim = jnp.maximum(hit.prim, 0)
        v = scene.tri_verts[prim]
        n = corner_normals(scene, prim)
        mat_idx = scene.tri_material[prim]
        bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
        position = jnp.einsum("rk,rkc->rc", bary, v)
        normal = normalize(jnp.einsum("rk,rkc->rc", bary, n))
        normal = jnp.where(dot(normal, d, keepdims=True) > 0, -normal, normal)
        wo = -d

        mats_lane = scene.materials.gather(mat_idx)
        tint = mats_lane.tint
        roughness = mats_lane.roughness
        specularity = mats_lane.specularity
        metallic = mats_lane.metallic
        # Cutout materials store a threshold in the coverage slot
        # (Material.h:84-85) — the preview has no texture fetch, so they
        # render opaque; only genuine partial coverage blends.
        is_cutout = (mats_lane.flags & 2) != 0
        alpha = jnp.where(is_cutout, 1.0, mats_lane.coverage)

        color = _light_contribution(scene, position, normal, wo, tint,
                                    roughness, specularity, metallic)

        # Ambient / environment with SSAO modulation (first layer only —
        # the reference's SSAO reads the opaque G-buffer, Renderer.cpp:650).
        if scene.environment is not None:
            from bifrost3d_tpu.lights.environment import environment_evaluate
            # Crude irradiance: env along the normal (preview fidelity).
            ambient_light = environment_evaluate(scene.environment, normal)
        else:
            ambient_light = ambient

        if enable_ssao and layer == 0:
            # View-space G-buffer for the AO pass.
            inv_rot = quat_conjugate(camera.transform.rotation)
            view_pos = quat_rotate(
                inv_rot, position - camera.transform.translation)
            view_nrm = quat_rotate(inv_rot, normal)
            vp = view_pos.reshape(height, width, 3)
            vn = view_nrm.reshape(height, width, 3)
            vmask = mask.reshape(height, width)
            ao = ssao(vp, vn, vmask)
            ao = bilateral_blur(ao, vp[..., 2]).reshape(-1)
        else:
            ao = jnp.ones_like(hit.t)

        color = color + tint * ambient_light * ao[..., None]
        color_acc = color_acc + jnp.where(
            mask[..., None],
            (transmittance * alpha)[..., None] * color, 0.0)
        transmittance = jnp.where(mask, transmittance * (1.0 - alpha),
                                  transmittance)
        alive = mask & (alpha < 1.0)
        if layer + 1 < layers:
            # Continue the ray past the transparent surface: offset to the
            # exit side (the flipped normal faces the ray origin).
            o = jnp.where(alive[..., None],
                          offset_ray_origin(position, -normal), o)

    if scene.environment is not None:
        from bifrost3d_tpu.lights.environment import environment_evaluate
        background = environment_evaluate(scene.environment, d)
    else:
        background = jnp.broadcast_to(scene.environment_tint, d.shape)
    img = color_acc + transmittance[..., None] * background
    return img.reshape(height, width, 3)


class PreviewBackend:
    """Adapter exposing the (stateless) preview rasterizer analogue through
    the progressive-backend protocol, so the Compositor can host both
    renderer kinds per camera — the role DX11OptiXAdaptor plays for the
    reference (``DX11OptiXAdaptor/Adaptor.cpp:39-130``)."""

    def __init__(self, scene, camera, width: int, height: int,
                 enable_ssao: bool = True):
        self.scene = scene
        self.camera = camera
        self.width = width
        self.height = height
        self.enable_ssao = enable_ssao
        self.accumulations = 0

    def reset(self) -> None:
        self.accumulations = 0

    def render(self):
        self.accumulations += 1
        return render_preview(self.scene, self.camera, self.width,
                              self.height, enable_ssao=self.enable_ssao)
