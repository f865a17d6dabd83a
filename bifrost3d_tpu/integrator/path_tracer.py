"""Wavefront mesh path tracer with NEE (RIS) + MIS.

TPU-native re-design of the reference's OptiX megakernel path
(SURVEY.md §3.2): the per-thread ``do { rtTrace; shade; shadow rtTrace }``
becomes a fused per-iteration wavefront step over a flat ray pool —
BVH trace, attribute interpolation, masked shading-model dispatch,
resampled next-event estimation (RIS over ``next_event_sample_count``
candidates with toroidally-shifted stratified offsets, MonteCarlo.cu:91-123),
balance-heuristic MIS (MonteCarlo.h:20-35), shadow trace, and BSDF sampling
— with the reference's firefly clamps and path-regularization hook.

RNG is Owen-scrambled Sobol keyed by (accumulation, pixel_hash,
8·bounce + dim) exactly as the reference (Types.h:422-427, 452-459).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.geometry.traverse import intersect_scene, intersect_scene_any
from bifrost3d_tpu.lights.analytic import (
    _ray_sphere_t,
    evaluate_light,
    light_pdf,
    sample_light,
)
from bifrost3d_tpu.lights.environment import (
    environment_evaluate,
    environment_pdf,
)
from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LIGHT_SPOT
from bifrost3d_tpu.math.ray_offset import offset_ray_origin
from bifrost3d_tpu.math.vec import dot, normalize, reflect, to_local, to_world
from bifrost3d_tpu.sampling.hashes import pcg2d
from bifrost3d_tpu.sampling.sobol import Dimension, path_rng_4d
from bifrost3d_tpu.scene.camera import PinholeCamera, camera_ray_directions
from bifrost3d_tpu.scene.materials import (
    FLAG_CUTOUT,
    FLAG_THIN_WALLED,
    SHADING_DIFFUSE,
    SHADING_TRANSMISSIVE,
)
from bifrost3d_tpu.scene.render_scene import RenderScene
from bifrost3d_tpu.shading.default_shading import DefaultShading
from bifrost3d_tpu.shading.diffuse_shading import DiffuseShading
from bifrost3d_tpu.shading.transmissive_shading import TransmissiveShading


class RenderSettings(NamedTuple):
    """Per-camera settings (Renderer.h:47-63, PublicTypes.h:40-45)."""

    max_bounce_count: int = 4
    next_event_sample_count: int = 3
    path_regularization_scale: float = 0.0   # 0 = off
    path_regularization_decay: float = 0.0
    firefly_clamp: float = 4.0               # throughput clamp at light hits
    delta_light_clamp: float = 32.0          # f clamp for delta-light × specular
    # Static hint: the scene contains semi-transparent surfaces (coverage<1,
    # coverage textures, or cutouts). When set, shadow rays march through up
    # to ``shadow_coverage_steps`` surfaces multiplying throughput by
    # 1-coverage — the analogue of the reference's shadow_any_hit
    # (MonteCarlo.cu:278-285). When clear, occlusion is a single binary
    # any-hit query. Use settings_for_scene() to fill it.
    coverage_aware_shadows: bool = False
    shadow_coverage_steps: int = 4
    # Extra wavefront iterations granted to the fixed-iteration (dense)
    # integrator for coverage/backface PASSTHROUGH events, which advance the
    # ray without consuming a bounce (the reference's do/while never charges
    # passthrough against the bounce budget, SimpleRGPs.cu:133-137). A lane
    # that still has passthrough surfaces ahead when iterations run out loses
    # the rest of its path, so semi-transparent scenes need a bigger budget —
    # settings_for_scene() raises it to 8 for them.
    passthrough_slack: int = 2
    # Use the presampled environment pool for NEE when the scene carries one
    # (the reference's default, Defines.h:15). Falls back to 2-level CDF
    # search when the scene has no pool.
    use_presampled_environment: bool = True
    # Static hint: which shading models the scene uses (0 Default, 1 Diffuse,
    # 2 Transmissive). Evaluating only present models skips whole dense
    # pipelines — the TPU analogue of the reference's per-material closest-hit
    # program selection (Renderer.cpp:753-850). Use settings_for_scene().
    shading_models_present: tuple = (0, 1, 2)
    # Pooled wavefront: sort the lane pool by direction octant (inactive
    # lanes last) every N iterations, so the hierarchical trace kernel's
    # 256-ray blocks stay coherent after bounces mix fresh camera rays with
    # old bounce rays (SURVEY §7.3 #1 mitigation). 0 = off. Only pays for
    # large scenes (cull-based kernels); settings_for_scene enables it when
    # the scene carries a cluster packing.
    sort_rays_every: int = 0
    # Static scene hint: the texture bank carries a Trilinear-minification
    # sampler (Texture.h:26-60). When set, the shade stage derives a ray
    # footprint (hit distance × pixel solid angle × per-triangle texel
    # density) and sample_texture blends the two surrounding mip levels;
    # when clear the mip machinery compiles away. settings_for_scene fills
    # it from TextureBank.has_trilinear().
    trilinear_textures: bool = False
    # Rematerialize each wavefront iteration in the backward pass
    # (jax.checkpoint around the bounce step): reverse-mode otherwise
    # saves every iteration's intermediates (shading lobes, RIS
    # candidates), trading HBM for FLOPs. SURVEY §7.3 #7; measured on the
    # CornellBox train step in BASELINE.md (r4 backward roofline).
    remat_bounces: bool = False
    # Detached-replay custom VJP (VERDICT r4 #3/r5 lever): the forward
    # pass records each bounce's hit (t, prim, u, v) and shadow
    # transmittance — the only scene queries, all already detached — and
    # the backward pass differentiates a REPLAY of the estimator from
    # those records, so it never traces a ray. Gradients are identical to
    # plain reverse-mode (the recorded quantities are stop_gradient'ed in
    # both); the backward loses the remat path's forward re-trace.
    detached_replay_vjp: bool = False


def settings_for_scene(scene: RenderScene, **overrides) -> RenderSettings:
    """RenderSettings with static scene-content hints filled from the
    concrete material table (shading models present, semi-transparency)."""
    present = tuple(sorted(set(
        int(m) for m in np.asarray(scene.materials.shading_model))))
    mats = scene.materials
    semi_transparent = bool(
        np.any(np.asarray(mats.coverage) < 1.0)
        or np.any(np.asarray(mats.coverage_texture) >= 0)
        or np.any(np.asarray(mats.flags) & FLAG_CUTOUT))
    overrides.setdefault("coverage_aware_shadows", semi_transparent)
    if semi_transparent:
        overrides.setdefault("passthrough_slack", 8)
    # Octant-sort the pooled wavefront on large scenes: block coherence
    # feeds the hierarchical kernel's culling (+12% measured on the glTF
    # MaterialScene). Small scenes trace dense streaming — sorting would be
    # pure overhead there.
    overrides.setdefault("sort_rays_every",
                         1 if scene.tri_clustered is not None else 0)
    overrides.setdefault("trilinear_textures",
                         scene.textures.has_trilinear()
                         if hasattr(scene.textures, "has_trilinear")
                         else False)
    # Remat the bounce loop: free in forward-only jits (checkpoint only
    # changes AD), 1.6x on the CornellBox train step (BASELINE.md r4
    # backward roofline: 74.9 -> 45.7 ms at 256², 2 bounces).
    overrides.setdefault("remat_bounces", True)
    return RenderSettings(shading_models_present=present, **overrides)


def _reverse_halton_offsets(count: int = 8) -> np.ndarray:
    """4D reverse-Halton toroidal-shift offsets (Renderer.cpp:323-336).

    Offset 0 is (0,0,0,0) so the first RIS candidate uses the base sample.
    """
    primes = [2, 3, 5, 7]

    def reverse_halton(p, i):
        h, f = 0.0, 1.0 / p
        fct = f
        while i > 0:
            digit = i % p
            h += (0 if digit == 0 else p - digit) * fct
            i //= p
            fct *= f
        return h

    out = np.zeros((count, 4), np.float32)
    for i in range(count):
        # ReverseHalton(index).sample4f() consumes primes 2,3,5,7 in order.
        out[i] = [reverse_halton(p, i) for p in primes]
    return out


_RIS_OFFSETS = np.asarray(_reverse_halton_offsets(8))


def mis_weight(pdf1, pdf2):
    """Balance heuristic with inf/NaN handling (MonteCarlo.h:20-25)."""
    divisor = pdf1 + pdf2
    result = pdf1 / jnp.where(divisor == 0.0, 1.0, divisor)
    invalid = jnp.isinf(divisor) | jnp.isnan(result)
    return jnp.where(invalid, jnp.where(pdf1 <= pdf2, 0.0, 1.0), result)


def _toroidal_shift(base, shift):
    s = base + shift
    return s - jnp.floor(s)


def _fix_backfacing_shading_normal(w, n, target_cos=0.002):
    """Utils.h fix_backfacing_shading_normal, vectorized."""
    cos_theta = dot(w, n, keepdims=True)
    fixed = normalize(n - (cos_theta - target_cos) * w)
    return jnp.where(cos_theta < target_cos, fixed, n)


# ---------------------------------------------------------------------------
# Shading-model dispatch (masked evaluate-all — SURVEY.md §7.3 #3)
# ---------------------------------------------------------------------------

class _ShadingBundle(NamedTuple):
    default: DefaultShading
    diffuse: DiffuseShading
    transmissive: TransmissiveShading
    model: jnp.ndarray  # [...] int32


def _surface_material_params(scene: RenderScene, mats, texcoord,
                             tint_roughness_scale=None, footprint_uv=None,
                             trilinear: bool = False):
    """Resolve per-hit material params: constants × texture fetches ×
    per-vertex tint-roughness scale (the reference's get_tint_roughness /
    get_metallic / get_coverage texture helpers, Types.h:353-416).

    ``mats`` is the PER-LANE MaterialArray from ``materials.gather(idx)``
    (one one-hot matmul replaces ~12 per-field TPU gathers, BASELINE.md)."""
    from bifrost3d_tpu.io.texture import sample_texture

    tint = mats.tint
    roughness = mats.roughness
    metallic = mats.metallic
    coverage_or_threshold = mats.coverage
    coverage_tex = None
    if texcoord is not None:
        tr = sample_texture(scene.textures,
                            mats.tint_roughness_texture, texcoord,
                            footprint_uv=footprint_uv, trilinear=trilinear)
        tint = tint * tr[..., :3]
        roughness = roughness * tr[..., 3]
        metallic = metallic * sample_texture(
            scene.textures, mats.metallic_texture, texcoord,
            footprint_uv=footprint_uv, trilinear=trilinear)[..., 0]
        coverage_tex = sample_texture(
            scene.textures, mats.coverage_texture, texcoord,
            footprint_uv=footprint_uv, trilinear=trilinear)[..., 0]
    if coverage_tex is None:
        coverage_tex = jnp.ones_like(coverage_or_threshold)
    # Cutout materials binarize the texture sample against the stored value,
    # which is then a threshold, not a coverage (Types.h:405-413,
    # Material.h:84-85: coverage and cutout_threshold share storage).
    is_cutout = (mats.flags & FLAG_CUTOUT) != 0
    coverage = jnp.where(
        is_cutout,
        jnp.where(coverage_tex < coverage_or_threshold, 0.0, 1.0),
        coverage_or_threshold * coverage_tex)
    if tint_roughness_scale is not None:
        tint = tint * tint_roughness_scale[..., :3]
        roughness = roughness * tint_roughness_scale[..., 3]
    return tint, roughness, metallic, coverage


def _create_shading(materials, cos_theta_o, min_roughness,
                    present=(0, 1, 2), tint=None, roughness=None,
                    metallic=None, thin_walled=None):
    """Construct only the shading models the scene uses (``present`` is
    static — absent models cost nothing). ``materials`` is the PER-LANE
    MaterialArray from ``gather(idx)``. Textured params may be passed in
    explicitly (from :func:`_surface_material_params`)."""
    if tint is None:
        tint = materials.tint
    if roughness is None:
        roughness = materials.roughness
    if metallic is None:
        metallic = materials.metallic
    roughness = jnp.maximum(roughness, min_roughness)
    default = DefaultShading.create(
        tint=tint,
        roughness=roughness,
        specularity=materials.specularity,
        metallic=metallic,
        coat=materials.coat,
        coat_roughness=jnp.maximum(
            materials.coat_roughness, min_roughness),
        abs_cos_theta_o=jnp.abs(cos_theta_o)) if 0 in present else None
    diffuse = DiffuseShading.create(tint=tint, roughness=roughness) \
        if 1 in present else None
    transmissive = TransmissiveShading.create(
        tint=tint, roughness=roughness,
        specularity=materials.specularity,
        cos_theta_o=cos_theta_o,
        thin_walled=thin_walled) if 2 in present else None
    return _ShadingBundle(default, diffuse, transmissive,
                          materials.shading_model)


def _shading_evaluate_with_pdf(b: _ShadingBundle, wo, wi):
    parts = []
    if b.default is not None:
        parts.append((0, b.default.evaluate_with_pdf(wo, wi)))
    if b.diffuse is not None:
        parts.append((SHADING_DIFFUSE, b.diffuse.evaluate_with_pdf(wo, wi)))
    if b.transmissive is not None:
        parts.append((SHADING_TRANSMISSIVE,
                      b.transmissive.evaluate_with_pdf(wo, wi)))
    m = b.model
    f, pdf = parts[0][1].reflectance, parts[0][1].pdf
    for model, resp in parts[1:]:
        f = jnp.where(m[..., None] == model, resp.reflectance, f)
        pdf = jnp.where(m == model, resp.pdf, pdf)
    return f, pdf


def _shading_sample(b: _ShadingBundle, wo, u3):
    from bifrost3d_tpu.bsdf.types import BSDFSample

    parts = []
    if b.default is not None:
        parts.append((0, b.default.sample(wo, u3)))
    if b.diffuse is not None:
        parts.append((SHADING_DIFFUSE, b.diffuse.sample(wo, u3)))
    if b.transmissive is not None:
        parts.append((SHADING_TRANSMISSIVE, b.transmissive.sample(wo, u3)))
    m = b.model

    def pick(field):
        out = getattr(parts[0][1], field)
        for model, s in parts[1:]:
            val = getattr(s, field)
            mm = m[..., None] if val.ndim > m.ndim else m
            out = jnp.where(mm == model, val, out)
        return out

    return BSDFSample(*(pick(f) for f in BSDFSample._fields))


# ---------------------------------------------------------------------------
# Light sampling (NEE with RIS)
# ---------------------------------------------------------------------------

def _sample_single_light(scene: RenderScene, bundle, position, wo, shading_normal,
                         u3, settings: RenderSettings):
    """One NEE candidate (MonteCarlo.cu:61-87): pick a light uniformly,
    sample it, fold |N·L|/pdf, MIS weight, and the material response into
    the radiance. Returns (direction, distance, weighted_radiance)."""
    n_lights = scene.lights.count
    use_pool = (settings.use_presampled_environment
                and scene.environment_presampled is not None)
    has_env = scene.environment is not None
    if use_pool and scene.environment_presampled.sample_count <= 1:
        # Pool of one sample: the env had no usable importance — NEE to it
        # is disabled entirely (PresampledEnvironmentMap.h:64).
        has_env = False
    total = n_lights + (1 if has_env else 0)
    if total == 0:
        z = jnp.zeros(position.shape[:-1])
        return position, z, jnp.zeros_like(position), z > 0.0

    pick = jnp.minimum((u3[..., 2] * total).astype(jnp.int32), total - 1)

    if n_lights > 0:
        ls = sample_light(scene.lights, jnp.minimum(pick, n_lights - 1),
                          position, u3[..., :2])
    if has_env:
        if use_pool:
            from bifrost3d_tpu.lights.environment import (
                presampled_environment_sample)
            es = presampled_environment_sample(
                scene.environment_presampled, u3[..., 0])
        else:
            from bifrost3d_tpu.lights.environment import environment_sample
            es = environment_sample(scene.environment, u3[..., :2])
        if n_lights > 0:
            is_env = pick == n_lights
            from bifrost3d_tpu.lights.types import LightSample
            ls = LightSample(
                direction=jnp.where(is_env[..., None], es.direction, ls.direction),
                distance=jnp.where(is_env, es.distance, ls.distance),
                radiance=jnp.where(is_env[..., None], es.radiance, ls.radiance),
                pdf=jnp.where(is_env, es.pdf, ls.pdf),
                is_delta=jnp.where(is_env, es.is_delta, ls.is_delta))
        else:
            ls = es

    radiance = ls.radiance * total  # account for uniform light pick

    n_dot_l = dot(shading_normal, ls.direction)
    safe_pdf = jnp.maximum(ls.pdf, 1e-12)
    radiance = radiance * (jnp.abs(n_dot_l) / safe_pdf)[..., None]
    radiance = jnp.where((ls.pdf > 0.0)[..., None], radiance, 0.0)

    wi = to_local(ls.direction, shading_normal)
    f, bsdf_pdf = _shading_evaluate_with_pdf(bundle, wo, wi)
    # MIS for area lights; firefly clamp for delta lights (MonteCarlo.cu:79-84).
    weight = jnp.where(ls.is_delta, 1.0, mis_weight(ls.pdf, bsdf_pdf))
    f = jnp.where(ls.is_delta[..., None],
                  jnp.minimum(f, settings.delta_light_clamp), f)
    radiance = radiance * weight[..., None] * f
    # PDF validity of the candidate itself (Types.h:170 is_valid) — kept
    # separately from the radiance so the caller can key MIS bookkeeping on
    # it rather than on the radiance sum (MonteCarlo.cu:231-233).
    pdf_valid = ls.pdf > 1e-6
    return ls.direction, ls.distance, radiance, pdf_valid


def _reestimated_light_samples(scene, bundle, position, wo, shading_normal,
                               u4_base, settings: RenderSettings):
    """RIS over next_event_sample_count candidates (MonteCarlo.cu:91-123).

    Returns (direction, distance, radiance, pdf_valid): ``pdf_valid`` is the
    PDF validity of the RIS-SELECTED candidate (the reference reservoir keeps
    the whole LightSample incl. its PDF; ``LightSample::none()`` is invalid),
    which is what MIS-disable keys on (MonteCarlo.cu:231-233) — NOT whether
    the selected radiance happens to be zero.
    """
    direction = jnp.zeros_like(position)
    distance = jnp.zeros(position.shape[:-1])
    radiance = jnp.zeros_like(position)
    pdf_valid = jnp.zeros(position.shape[:-1], bool)  # LightSample::none()
    if settings.next_event_sample_count <= 0:
        # NEE disabled: no candidates (and no 0/0 from the average below).
        return direction, distance, radiance, pdf_valid
    for s in range(settings.next_event_sample_count):
        u4 = _toroidal_shift(u4_base, _RIS_OFFSETS[s])
        new_dir, new_dist, new_rad, new_valid = _sample_single_light(
            scene, bundle, position, wo, shading_normal, u4[..., :3], settings)
        w_old = jnp.sum(radiance, axis=-1)
        w_new = jnp.sum(new_rad, axis=-1)
        any_w = w_old + w_new > 0.0
        p_new = w_new / jnp.where(any_w, w_old + w_new, 1.0)
        take = u4[..., 3] < p_new
        direction = jnp.where(take[..., None], new_dir, direction)
        distance = jnp.where(take, new_dist, distance)
        pdf_valid = jnp.where(take, new_valid, pdf_valid)
        # Reservoir update: the kept candidate's radiance is divided by its
        # selection probability; the denominator is forced to 1 whenever the
        # reservoir is empty or the probability underflows, so the masked-out
        # quotient can't produce inf/NaN in the backward pass.
        denom = jnp.where(take, p_new, 1.0 - p_new)
        denom = jnp.where(any_w & (denom > 1e-20), denom, 1.0)
        radiance = jnp.where(
            any_w[..., None],
            jnp.where(take[..., None], new_rad, radiance) / denom[..., None],
            0.0)
    return (direction, distance,
            radiance / settings.next_event_sample_count, pdf_valid)


# ---------------------------------------------------------------------------
# The wavefront step
# ---------------------------------------------------------------------------

def _intersect_analytic_lights(scene: RenderScene, origin, direction):
    """Nearest analytic light hit — sphere lights AND spot disk lights, so
    BSDF-sampled rays can hit both with MIS (the reference's light geometry
    program, LightSources/LightSources.cu:31-91).
    Returns (t [r], light_index [r])."""
    if scene.lights.count == 0:
        r = origin.shape[0]
        return jnp.full(r, jnp.inf), jnp.full(r, -1, jnp.int32)
    lights = scene.lights
    is_sphere = lights.kind == LIGHT_SPHERE
    is_spot = lights.kind == LIGHT_SPOT
    pos = lights.position[None, :, :]
    radius = lights.radius[None, :]

    t_sphere = _ray_sphere_t(origin[:, None, :], direction[:, None, :],
                             pos, radius)

    # Spot = disk at (position, normal=direction, radius)
    # (Intersect::ray_disk, LightSources.cu:40-41).
    ldir = lights.direction[None, :, :]
    denom = dot(direction[:, None, :], ldir)
    t_disk = dot(pos - origin[:, None, :], ldir) / jnp.where(
        jnp.abs(denom) > 1e-9, denom, 1e-9)
    hit_pt = origin[:, None, :] + direction[:, None, :] * t_disk[..., None]
    on_disk = jnp.sum(jnp.square(hit_pt - pos), axis=-1) <= radius * radius
    t_disk = jnp.where(on_disk & (jnp.abs(denom) > 1e-9), t_disk, -1.0)

    t = jnp.where(is_sphere[None, :], t_sphere,
                  jnp.where(is_spot[None, :], t_disk, -1.0))
    t = jnp.where((t > 0) & (radius > 0), t, jnp.inf)
    t_min = jnp.min(t, axis=1)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    return t_min, jnp.where(jnp.isfinite(t_min), idx, -1)


def _fetch_tri_attributes(scene: RenderScene, prim):
    """All per-triangle attributes for lanes ``prim`` in ONE fetch
    → (verts [r,3,3], corner_normals [r,3,3], uvs [r,3,2],
       tint_roughness [r,3,4], mat_idx [r] int32).

    Separate per-field fetches cost ~0.7-1 ms each per 65k lanes on TPU
    (per-index, not per-element — BASELINE.md), so the 5 attribute reads at
    a mesh hit cost more than the trace. Packing the tables into one
    [t, 34] row matrix (concat is loop-invariant: XLA hoists it out of the
    wavefront loop) makes it a single row gather — or, for small meshes, a
    free one-hot MXU contraction. int fields survive exactly: int16 oct
    normals and material ids are exact in f32."""
    from bifrost3d_tpu.math.octahedral import octahedral_decode

    t = scene.tri_verts.shape[0]
    packed = jnp.concatenate([
        scene.tri_verts.reshape(t, 9),
        scene.tri_normals_oct.astype(jnp.float32).reshape(t, 6),
        scene.tri_uvs.reshape(t, 6),
        scene.tri_tint_roughness.reshape(t, 12),
        scene.tri_material.astype(jnp.float32)[:, None],
    ], axis=1)  # [t, 34]
    if t <= 512:
        oh = (prim[:, None] == jnp.arange(t, dtype=prim.dtype)
              ).astype(jnp.float32)
        rows = jnp.dot(oh, packed, precision=jax.lax.Precision.HIGHEST)
    else:
        rows = packed[prim]
    r = prim.shape[0]
    v = rows[:, 0:9].reshape(r, 3, 3)
    n_oct = jnp.round(rows[:, 9:15]).astype(jnp.int16).reshape(r, 3, 2)
    uv = rows[:, 15:21].reshape(r, 3, 2)
    tr = rows[:, 21:33].reshape(r, 3, 4)
    mat_idx = jnp.round(rows[:, 33]).astype(jnp.int32)
    return v, octahedral_decode(n_oct), uv, tr, mat_idx


def _fetch_tri_uv_mat(scene: RenderScene, prim):
    """Narrow attribute fetch for the coverage/shadow path: only the uv and
    material-id columns (7 of the 34 packed columns). The one-hot dot path
    can't dead-code-eliminate unused matmul columns (ADVICE r3), so the
    coverage evaluation packs its own [t, 7] table — loop-invariant, hoisted
    by XLA like the full packing."""
    t = scene.tri_uvs.shape[0]
    packed = jnp.concatenate([
        scene.tri_uvs.reshape(t, 6),
        scene.tri_material.astype(jnp.float32)[:, None],
    ], axis=1)  # [t, 7]
    if t <= 512:
        oh = (prim[:, None] == jnp.arange(t, dtype=prim.dtype)
              ).astype(jnp.float32)
        rows = jnp.dot(oh, packed, precision=jax.lax.Precision.HIGHEST)
    else:
        rows = packed[prim]
    r = prim.shape[0]
    uv = rows[:, 0:6].reshape(r, 3, 2)
    mat_idx = jnp.round(rows[:, 6]).astype(jnp.int32)
    return uv, mat_idx


def _coverage_at_hit(scene: RenderScene, hit):
    """Coverage of the surface at a Hit (cutout binarization included)."""
    prim = jnp.maximum(hit.prim, 0)
    uv, mat_idx = _fetch_tri_uv_mat(scene, prim)
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
    texcoord = jnp.einsum("rk,rkc->rc", bary, uv)
    _, _, _, coverage = _surface_material_params(
        scene, scene.materials.gather(mat_idx), texcoord)
    return coverage


def _shadow_transmittance(scene: RenderScene, origin, direction, t_max,
                          eps, steps: int):
    """Shadow-ray transmittance through semi-transparent surfaces.

    The reference's shadow_any_hit multiplies the shadow throughput by
    1-coverage at every surface along the segment and terminates when black
    (MonteCarlo.cu:278-285). Any-hit enumeration doesn't exist in a wavefront
    tracer, so this marches the closest hit up to ``steps`` times, advancing
    the origin past each intersection. Surfaces beyond ``steps`` count as
    fully occluding (conservative).
    """
    trans = jnp.ones(origin.shape[0], jnp.float32)
    t_remaining = t_max
    for step in range(steps):
        hit = intersect_scene(scene.bvh, scene.tri_verts, origin, direction,
                              t_min=eps, t_max=t_remaining,
                              tri_components=scene.tri_components,
                              tri_clustered=scene.tri_clustered)
        blocked = hit.mask & (trans > 0.0)
        if step == steps - 1:
            # Budget exhausted: any remaining surface fully occludes.
            return jnp.where(blocked, 0.0, trans)
        coverage = _coverage_at_hit(scene, hit)
        trans = jnp.where(blocked, trans * (1.0 - coverage), trans)
        advance = jnp.where(hit.mask, hit.t, 0.0) + eps
        origin = origin + direction * advance[..., None]
        t_remaining = t_remaining - advance
    return trans


class _PathState(NamedTuple):
    origin: jnp.ndarray
    direction: jnp.ndarray
    throughput: jnp.ndarray
    radiance: jnp.ndarray
    bsdf_pdf: jnp.ndarray       # last BSDF pdf (for MIS); <= 0 disables MIS
    bsdf_was_delta: jnp.ndarray
    pixel_hash: jnp.ndarray
    bounce: jnp.ndarray         # per-lane bounce counter
    active: jnp.ndarray


class _HitRecords(NamedTuple):
    """One wavefront iteration's scene-query results — the ONLY values the
    estimator takes from the geometry, and (by the detached-hit design)
    all stop_gradient'ed. Recording them makes the whole bounce loop
    replayable without an intersector: the replay recomputes every
    differentiable quantity (attributes, shading, RIS NEE, sampling
    transforms) from these plus the RNG chain, which is what the
    detached-replay VJP differentiates."""

    t: jnp.ndarray             # [r] hit distance (inf on miss)
    prim: jnp.ndarray          # [r] int32
    u: jnp.ndarray             # [r]
    v: jnp.ndarray             # [r]
    shadow_trans: jnp.ndarray  # [r] NEE shadow transmittance


def _wavefront_step(scene: RenderScene, settings: RenderSettings,
                    accumulation, state: _PathState,
                    pixel_angle=None, live_count=None,
                    replay: _HitRecords | None = None,
                    record: bool = False):
    """``live_count`` (traced i32, optional): the pooled wavefront's sorted
    live prefix — trace kernels skip whole ray blocks past it, so drained
    pool iterations cost O(live), not O(pool).

    ``replay``: reuse a previous run's scene-query results instead of
    intersecting (the detached-replay VJP's backward path — no tracing).
    ``record``: also return this iteration's _HitRecords."""
    (origin, direction, throughput, radiance, bsdf_pdf, bsdf_was_delta,
     pixel_hash, bounce, active) = state
    eps = scene.scene_epsilon

    # Detached intersection (SURVEY.md §7.2 step 7): the traversal's
    # while_loop is not reverse-differentiable and geometry gradients need
    # edge-aware estimators anyway — differentiate the *estimator* (shading,
    # light sampling, throughput) with the hit query treated as a sampler.
    if replay is not None:
        from bifrost3d_tpu.geometry.traverse import Hit
        hit = Hit(t=replay.t, prim=replay.prim, u=replay.u, v=replay.v)
    else:
        hit = jax.tree.map(
            jax.lax.stop_gradient,
            intersect_scene(scene.bvh, scene.tri_verts,
                          jax.lax.stop_gradient(origin),
                          jax.lax.stop_gradient(direction), t_min=eps,
                          tri_components=scene.tri_components,
                          tri_clustered=scene.tri_clustered,
                          live_count=live_count))
    t_light, light_idx = _intersect_analytic_lights(scene, origin, direction)

    light_first = t_light < hit.t
    mesh_hit = active & hit.mask & ~light_first
    light_hit = active & light_first
    miss = active & ~hit.mask & ~light_first

    # --- miss: environment (SimpleRGPs.cu:349-362) ---
    if scene.environment is not None:
        env_radiance = environment_evaluate(scene.environment, direction)
        env_pdf = environment_pdf(scene.environment, direction)
        use_mis = bsdf_pdf > 0.0
        w = jnp.where(use_mis, mis_weight(bsdf_pdf, env_pdf), 1.0)
        env_radiance = env_radiance * w[..., None]
    else:
        env_radiance = jnp.broadcast_to(scene.environment_tint, direction.shape)
    radiance = radiance + jnp.where(
        miss[..., None], throughput * env_radiance, 0.0)

    # --- analytic light hit (MonteCarlo.cu light_closest_hit) ---
    if scene.lights.count > 0:
        li = jnp.maximum(light_idx, 0)
        l_radiance = evaluate_light(scene.lights, li, origin, direction)
        l_pdf = light_pdf(scene.lights, li, origin, direction)
        use_mis = bsdf_pdf > 0.0
        w = jnp.where(use_mis, mis_weight(bsdf_pdf, l_pdf), 1.0)
        clamped_T = jnp.minimum(throughput, settings.firefly_clamp)
        radiance = radiance + jnp.where(
            light_hit[..., None], clamped_T * l_radiance * w[..., None], 0.0)

    # --- mesh hit shading ---
    prim = jnp.maximum(hit.prim, 0)
    v, n, uv, tr, mat_idx = _fetch_tri_attributes(scene, prim)
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)

    position = jnp.einsum("rk,rkc->rc", bary, v)
    shading_normal = normalize(jnp.einsum("rk,rkc->rc", bary, n))
    texcoord = jnp.einsum("rk,rkc->rc", bary, uv)
    tr_scale = jnp.einsum("rk,rkc->rc", bary, tr)
    geo_normal = normalize(jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]))

    # All material fields for this lane's hit in ONE one-hot matmul
    # (replaces ~12 separate TPU gathers — see MaterialArray.gather).
    mats_lane = scene.materials.gather(mat_idx)

    # Ray footprint in uv units for trilinear mip selection (Texture.h
    # Trilinear): per-triangle texel density × the pixel's world-space
    # width at the hit, spread by the incidence angle. Bounces reuse the
    # same segment-distance formula (primary-exact, bounce-approximate).
    if settings.trilinear_textures and pixel_angle is not None:
        world_area = 0.5 * jnp.linalg.norm(
            jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
        uv1 = uv[:, 1] - uv[:, 0]
        uv2 = uv[:, 2] - uv[:, 0]
        uv_area = 0.5 * jnp.abs(uv1[:, 0] * uv2[:, 1]
                                - uv1[:, 1] * uv2[:, 0])
        density = jnp.sqrt(uv_area / jnp.maximum(world_area, 1e-20))
        t_safe = jnp.where(hit.mask, hit.t, 0.0)
        # Grazing incidence elongates the footprint along the view;
        # cap the anisotropy compensation at 20:1 (GPU aniso-style).
        spread = jnp.maximum(jnp.abs(dot(geo_normal, direction)), 0.05)
        footprint_uv = density * t_safe * pixel_angle / spread
    else:
        footprint_uv = None

    # Textured material parameters (tint/roughness/metallic/coverage).
    tex_tint, tex_roughness, tex_metallic, tex_coverage = \
        _surface_material_params(scene, mats_lane, texcoord, tr_scale,
                                 footprint_uv=footprint_uv,
                                 trilinear=settings.trilinear_textures)

    flags = mats_lane.flags
    # Cutouts are implicitly thin-walled (Types.h:384: is_thin_walled()
    # tests Cutout | ThinWalled).
    thin_walled = (flags & (FLAG_THIN_WALLED | FLAG_CUTOUT)) != 0
    transmissive_model = mats_lane.shading_model == SHADING_TRANSMISSIVE

    hit_from_front = dot(geo_normal, direction) < 0.0
    backside_cull = ~hit_from_front & ~thin_walled & ~transmissive_model

    # Coverage / cutout (MonteCarlo.cu:152-164): stochastic transparency.
    u_bsdf4 = path_rng_4d(accumulation, pixel_hash,
                          bounce * Dimension.PER_BOUNCE + Dimension.BSDF)
    coverage = tex_coverage
    discard_coverage = coverage < u_bsdf4[..., 3]
    passthrough = mesh_hit & (backside_cull | discard_coverage)

    shade = mesh_hit & ~backside_cull & ~discard_coverage

    # Flip normals to the side the ray came from.
    geo_normal = jnp.where(hit_from_front[..., None], geo_normal, -geo_normal)
    sn = jnp.where(hit_from_front[..., None], shading_normal, -shading_normal)
    sn = _fix_backfacing_shading_normal(-direction, sn)

    wo_world = -direction
    wo = to_local(wo_world, sn)
    cos_theta_o = jnp.where(hit_from_front | thin_walled, wo[..., 2], -wo[..., 2])

    # Path regularization (MonteCarlo.cu:239-244).
    if settings.path_regularization_scale > 0.0:
        from bifrost3d_tpu.shading.fittings import estimate_ggx_alpha_from_max_pdf
        from bifrost3d_tpu.bsdf.ggx import roughness_from_alpha
        scale = settings.path_regularization_scale * (
            1.0 + settings.path_regularization_decay
            * accumulation.astype(jnp.float32))
        max_pdf = bsdf_pdf * scale
        min_alpha = estimate_ggx_alpha_from_max_pdf(
            jnp.abs(cos_theta_o), jnp.maximum(max_pdf, 1e-3))
        min_roughness = jnp.where(
            bsdf_was_delta | (bsdf_pdf <= 0.0), 0.0,
            roughness_from_alpha(min_alpha))
    else:
        min_roughness = jnp.zeros_like(cos_theta_o)

    bundle = _create_shading(mats_lane, cos_theta_o,
                             min_roughness, settings.shading_models_present,
                             tint=tex_tint, roughness=tex_roughness,
                             metallic=tex_metallic, thin_walled=thin_walled)

    # Surface emission.
    emission = mats_lane.emission
    radiance = radiance + jnp.where(shade[..., None], throughput * emission, 0.0)

    # --- NEE with RIS ---
    u_nee = path_rng_4d(accumulation, pixel_hash,
                        bounce * Dimension.PER_BOUNCE + Dimension.NEE)
    l_dir, l_dist, l_radiance, nee_valid = _reestimated_light_samples(
        scene, bundle, position, wo, sn, u_nee, settings)
    l_radiance = l_radiance * throughput
    # Scale-robust RT-Gems integer offset (Utils.h:372-397) along the side
    # the shadow ray leaves.
    shadow_side = jnp.where(dot(l_dir, geo_normal) >= 0, 1.0, -1.0)
    shadow_origin = offset_ray_origin(position,
                                      geo_normal * shadow_side[..., None])
    has_light = shade & (jnp.max(l_radiance, axis=-1) > 0.0)
    if replay is not None:
        shadow_trans = replay.shadow_trans
    elif settings.coverage_aware_shadows:
        shadow_trans = jax.lax.stop_gradient(_shadow_transmittance(
            scene, jax.lax.stop_gradient(shadow_origin),
            jax.lax.stop_gradient(l_dir),
            jax.lax.stop_gradient(l_dist) * (1.0 - 1e-4), eps,
            settings.shadow_coverage_steps))
    else:
        occluded = jax.lax.stop_gradient(intersect_scene_any(
            scene.bvh, scene.tri_verts,
            jax.lax.stop_gradient(shadow_origin), jax.lax.stop_gradient(l_dir),
            t_min=eps, t_max=jax.lax.stop_gradient(l_dist) * (1.0 - 1e-4),
            tri_components=scene.tri_components,
            tri_clustered=scene.tri_clustered, live_count=live_count))
        shadow_trans = jnp.where(occluded, 0.0, 1.0)
    radiance = radiance + jnp.where(
        has_light[..., None], l_radiance * shadow_trans[..., None], 0.0)

    # --- BSDF sampling ---
    s = _shading_sample(bundle, wo, u_bsdf4[..., :3])
    new_dir_world = to_world(s.direction, sn)
    is_reflection = s.direction[..., 2] >= 0.0
    # Mirror if the sampled direction points into the geometry
    # (MonteCarlo.cu:204-228).
    cos_geo = dot(new_dir_world, geo_normal)
    wrong_side = jnp.where(is_reflection, cos_geo < 0.0, cos_geo >= 0.0)
    new_dir_world = jnp.where(
        wrong_side[..., None], reflect(new_dir_world, geo_normal), new_dir_world)

    valid_sample = s.pdf > 0.0
    # f·|cos|/pdf for ALL lobes — delta reflectances fold 1/|cos| by
    # convention (r_sample), so this reduces to F/lobe_probability for
    # mirrors, exactly as the reference (MonteCarlo.cu:204-228).
    weight = jnp.abs(s.direction[..., 2]) / jnp.maximum(s.pdf, 1e-12)
    new_throughput = throughput * s.reflectance * weight[..., None]
    new_throughput = jnp.where(valid_sample[..., None], new_throughput, 0.0)

    bounce_side = jnp.where(dot(new_dir_world, geo_normal) >= 0, 1.0, -1.0)
    new_origin = offset_ray_origin(position,
                                   geo_normal * bounce_side[..., None])

    # MIS bookkeeping: pdf <= 0 disables MIS (delta bounce or no NEE).
    new_bsdf_pdf = jnp.where(s.is_delta | ~nee_valid, 0.0, s.pdf)

    # --- combine lane updates ---
    # Passthrough lanes continue along the same direction past the surface:
    # offset to the side opposite the one the ray arrived from.
    pass_origin = offset_ray_origin(position, -geo_normal)

    origin = jnp.where(shade[..., None], new_origin,
                       jnp.where(passthrough[..., None], pass_origin, origin))
    direction = jnp.where(shade[..., None], new_dir_world, direction)
    throughput = jnp.where(shade[..., None], new_throughput, throughput)
    bsdf_pdf = jnp.where(shade, new_bsdf_pdf, bsdf_pdf)
    bsdf_was_delta = jnp.where(shade, s.is_delta, bsdf_was_delta)
    bounce = jnp.where(shade, bounce + 1, bounce)
    active = (active & ~miss & ~light_hit
              & jnp.where(shade, jnp.max(throughput, axis=-1) > 0.0, True)
              & (bounce <= settings.max_bounce_count))

    new_state = _PathState(origin, direction, throughput, radiance, bsdf_pdf,
                           bsdf_was_delta, pixel_hash, bounce, active)
    if record:
        return new_state, _HitRecords(hit.t, hit.prim, hit.u, hit.v,
                                      shadow_trans)
    return new_state


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def _camera_pixel_angle(camera: PinholeCamera, height: int):
    """Vertical angular size of one pixel: fov_y/height with
    fov_y = 2·atan(1/proj[1,1]) — the footprint driver for trilinear
    mip selection. For orthographic projections (proj[1,1] = 2/height_w)
    this degrades to a small constant — acceptable: the mip path is a
    minification filter and orthographic cameras are preview-only."""
    f = camera.projection[1, 1]
    return 2.0 * jnp.arctan(1.0 / jnp.maximum(f, 1e-6)) / height

def render_sample_pixels(scene: RenderScene, camera: PinholeCamera,
                         x, y, width: int, height: int, accumulation,
                         settings: RenderSettings = RenderSettings()):
    """One progressive sample for pixel coords x/y ([...] uint32) → [..., 3].

    The shardable core (same contract as the SmallPT integrator): pixel
    indices are data; rows/tiles shard over the mesh.
    """
    if settings.detached_replay_vjp:
        return render_sample_pixels_detached(scene, camera, x, y, width,
                                             height, accumulation, settings)
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    state, shape = _pixel_lane_state(camera, x, y, width, accumulation,
                                     height)

    # Iterations = bounces + slack for coverage/backface passthrough lanes
    # (each iteration is one shade OR one passthrough; see passthrough_slack).
    n_iters = settings.max_bounce_count + 1 + settings.passthrough_slack
    step = partial(_wavefront_step, scene, settings, accumulation,
                   pixel_angle=_camera_pixel_angle(camera, height))
    if settings.remat_bounces:
        step = jax.checkpoint(step)
    state = jax.lax.fori_loop(0, n_iters, lambda i, s: step(s), state)
    return state.radiance.reshape(shape + (3,))


def _pixel_lane_state(camera, x, y, width, accumulation, height):
    """Camera-ray lane state for pixel coords x/y → (_PathState, shape)."""
    pixel_hash, _ = pcg2d(x, y)
    u_cam = path_rng_4d(accumulation, pixel_hash, jnp.uint32(Dimension.CAMERA))
    jitter = jnp.where(accumulation == 0, 0.5, u_cam[..., :2])
    xf = (x.astype(jnp.float32) + jitter[..., 0]) / width
    yf = 1.0 - (y.astype(jnp.float32) + jitter[..., 1]) / height
    origin, direction = camera_ray_directions(
        camera, jnp.stack([xf, yf], axis=-1))

    shape = x.shape
    flat = int(np.prod(shape)) if shape else 1
    state = _PathState(
        origin=origin.reshape(flat, 3),
        direction=direction.reshape(flat, 3),
        throughput=jnp.ones((flat, 3), jnp.float32),
        radiance=jnp.zeros((flat, 3), jnp.float32),
        bsdf_pdf=jnp.zeros(flat, jnp.float32),
        bsdf_was_delta=jnp.ones(flat, bool),  # primary bounce: no regularization
        pixel_hash=pixel_hash.reshape(flat),
        bounce=jnp.zeros(flat, jnp.uint32),
        active=jnp.isfinite(origin.reshape(flat, 3)[..., 0]),
    )
    return state, shape


def render_sample_pixels_detached(scene: RenderScene, camera: PinholeCamera,
                                  x, y, width: int, height: int,
                                  accumulation,
                                  settings: RenderSettings = RenderSettings()):
    """render_sample_pixels under a detached-replay custom VJP.

    Forward: run the wavefront normally, additionally stacking each
    iteration's _HitRecords (5 scalars/lane/bounce — the only scene-query
    outputs, all stop_gradient'ed in plain AD too). Backward: differentiate
    a REPLAY of the estimator driven by those records — attribute fetch,
    shading, RIS NEE, and the (reparameterized, hence param-differentiable)
    sampling transforms are recomputed; no ray is ever traced. Gradients
    match plain reverse-mode exactly; the backward drops the remat path's
    forward re-trace (the dominant cost of the r4 backward roofline).
    Camera/pixel cotangents are zero — differentiate scene parameters.
    """
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    n_iters = settings.max_bounce_count + 1 + settings.passthrough_slack
    pixel_angle = _camera_pixel_angle(camera, height)

    @jax.custom_vjp
    def run(scene, camera, x, y, accumulation):
        state, shape = _pixel_lane_state(camera, x, y, width, accumulation,
                                         height)
        state = jax.lax.fori_loop(
            0, n_iters,
            lambda i, s: _wavefront_step(scene, settings, accumulation, s,
                                         pixel_angle=pixel_angle),
            state)
        return state.radiance.reshape(shape + (3,))

    def fwd(scene, camera, x, y, accumulation):
        state, shape = _pixel_lane_state(camera, x, y, width, accumulation,
                                         height)

        def body(st, _):
            st2, rec = _wavefront_step(scene, settings, accumulation, st,
                                       pixel_angle=pixel_angle, record=True)
            return st2, rec

        state, records = jax.lax.scan(body, state, None, length=n_iters)
        out = state.radiance.reshape(shape + (3,))
        return out, (scene, camera, x, y, accumulation, records)

    def bwd(res, g):
        scene, camera, x, y, accumulation, records = res

        def replay_fn(s):
            st, shape = _pixel_lane_state(camera, x, y, width, accumulation,
                                          height)

            def body(stc, rec):
                return _wavefront_step(s, settings, accumulation, stc,
                                       pixel_angle=pixel_angle,
                                       replay=rec), None

            if settings.remat_bounces:
                body = jax.checkpoint(body)
            stf, _ = jax.lax.scan(body, st, records)
            return stf.radiance.reshape(shape + (3,))

        _, vjp = jax.vjp(replay_fn, scene)
        (s_bar,) = vjp(g)

        def zero_ct(a):
            a = jnp.asarray(a)
            if jnp.issubdtype(a.dtype, jnp.floating):
                return jnp.zeros_like(a)
            return np.zeros(a.shape, jax.dtypes.float0)

        return (s_bar, jax.tree.map(zero_ct, camera), zero_ct(x),
                zero_ct(y), zero_ct(accumulation))

    run.defvjp(fwd, bwd)
    return run(scene, camera, x, y, accumulation)


# ---------------------------------------------------------------------------
# Pooled wavefront with compaction + ray regeneration (SURVEY.md §7.3 #5)
# ---------------------------------------------------------------------------

def _make_camera_lanes(camera: PinholeCamera, pixel_idx, width: int,
                       height: int, accumulation,
                       pixel_end=None) -> _PathState:
    """Fresh camera-ray lanes for flat pixel indices ([r] int32; >=
    ``pixel_end`` means an idle lane). ``pixel_end`` may be traced (sharded
    renders pass a per-device row range); defaults to width·height."""
    n_pixels = width * height
    if pixel_end is None:
        pixel_end = n_pixels
    valid = pixel_idx < pixel_end
    safe_idx = jnp.minimum(pixel_idx, n_pixels - 1)
    x = (safe_idx % width).astype(jnp.uint32)
    y = (safe_idx // width).astype(jnp.uint32)
    pixel_hash, _ = pcg2d(x, y)
    u_cam = path_rng_4d(accumulation, pixel_hash, jnp.uint32(Dimension.CAMERA))
    jitter = jnp.where(accumulation == 0, 0.5, u_cam[..., :2])
    xf = (x.astype(jnp.float32) + jitter[..., 0]) / width
    yf = 1.0 - (y.astype(jnp.float32) + jitter[..., 1]) / height
    origin, direction = camera_ray_directions(
        camera, jnp.stack([xf, yf], axis=-1))
    r = pixel_idx.shape[0]
    return _PathState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((r, 3), jnp.float32),
        radiance=jnp.zeros((r, 3), jnp.float32),
        bsdf_pdf=jnp.zeros(r, jnp.float32),
        bsdf_was_delta=jnp.ones(r, bool),
        pixel_hash=pixel_hash,
        bounce=jnp.zeros(r, jnp.uint32),
        active=valid & jnp.isfinite(origin[..., 0]))


def render_pixels_pooled(scene: RenderScene, camera: PinholeCamera,
                         width: int, height: int, accumulation,
                         settings: RenderSettings = RenderSettings(),
                         pool_size: int = 65536,
                         pixel_start=0, n_pixels: int | None = None,
                         with_iters: bool = False):
    """Pooled wavefront over the flat pixel range
    [pixel_start, pixel_start + n_pixels) → (radiance [n_pixels, 3],
    ray_count [] uint32).

    The TPU answer to dead-lane waste in the fixed-iteration wavefront
    (the reference's megakernel keeps one thread per pixel for the whole
    path, SimpleRGPs.cu:131-140): a pool of ``pool_size`` lanes runs the
    wavefront step; finished lanes scatter-add their radiance into the
    frame and are immediately REFILLED with fresh camera rays from the
    remaining pixel queue, so every trace call runs at ~full occupancy
    regardless of path-length variance. Forward-only (dynamic while_loop);
    the differentiable path stays :func:`render_sample`.

    ``pixel_start`` may be traced (sharded renders pass per-device row
    offsets, e.g. ``axis_index * n_pixels``); ``n_pixels`` is static.
    ``ray_count`` counts live lanes per wavefront iteration × 2 (closest-hit
    + shadow trace) — the exact in-run ray tally the benchmark reports.
    """
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    if n_pixels is None:
        n_pixels = width * height
    pixel_start = jnp.asarray(pixel_start, jnp.int32)
    pixel_end = pixel_start + n_pixels
    r = min(pool_size, n_pixels)

    pixel_idx0 = pixel_start + jnp.arange(r, dtype=jnp.int32)
    state0 = _make_camera_lanes(camera, pixel_idx0, width, height,
                                accumulation, pixel_end)
    accum0 = jnp.zeros((n_pixels, 3), jnp.float32)
    step = partial(_wavefront_step, scene, settings, accumulation,
                   pixel_angle=_camera_pixel_angle(camera, height))

    # Safety bound: generous multiple of the expected iteration count
    # (per-wave bounces+passthroughs × number of pool refills) so a
    # pathological passthrough chain can't hang the loop.
    bounce_iters = settings.max_bounce_count + 1 + settings.passthrough_slack
    max_iters = (n_pixels // r + 1) * bounce_iters * 4 + 64

    def cond(carry):
        state, pixel_idx, accum, next_pixel, it, rays = carry
        return (jnp.any(state.active) | (next_pixel < pixel_end)) \
            & (it < max_iters)

    def body(carry):
        state, pixel_idx, accum, next_pixel, it, rays = carry
        if settings.sort_rays_every:
            # Origin-Morton + direction-octant sort (inactive lanes last)
            # BEFORE the step: keeps the trace kernel's ray blocks
            # spatially AND directionally coherent so block-level BVH
            # culling stays effective after bounces scatter ray origins
            # (SURVEY §7.3 #1; octant alone recovered only +12% — bounce
            # rays from distant surfaces share octants but not subtrees),
            # and makes the live lanes a PREFIX the kernels can bound.
            def sorted_pool(args):
                from bifrost3d_tpu.math.morton import morton_encode_3d
                st, pix = args
                d = st.direction
                lo = scene.bvh.node_min[0]
                hi = scene.bvh.node_max[0]
                scale = 63.0 / jnp.maximum(hi - lo, 1e-20)
                q = jnp.clip((st.origin - lo) * scale, 0.0, 63.0
                             ).astype(jnp.uint32)
                m = morton_encode_3d(q[:, 0], q[:, 1], q[:, 2])  # 18 bits
                octant = ((d[:, 0] < 0).astype(jnp.uint32) * 4
                          + (d[:, 1] < 0).astype(jnp.uint32) * 2
                          + (d[:, 2] < 0).astype(jnp.uint32))
                key = ((m << jnp.uint32(3)) | octant).astype(jnp.int32)
                key = key + jnp.where(st.active, 0, 1 << 22)
                order = jnp.argsort(key, stable=True)
                return (jax.tree.map(lambda f: f[order], st), pix[order])

            state, pixel_idx = jax.lax.cond(
                it % settings.sort_rays_every == 0,
                sorted_pool, lambda args: args, (state, pixel_idx))
        # Live lanes form a sorted prefix only when the pool was sorted
        # THIS iteration — then the trace kernels can skip dead blocks.
        live = jnp.sum(state.active.astype(jnp.int32)) \
            if settings.sort_rays_every == 1 else None
        rays = rays + 2 * jnp.sum(state.active.astype(jnp.uint32))
        state = step(state, live_count=live)
        valid = pixel_idx < pixel_end
        done = valid & ~state.active

        # Scatter finished lanes into the frame (each pixel exactly once
        # per accumulation pass → plain add).
        accum = accum.at[jnp.clip(pixel_idx - pixel_start,
                                  0, n_pixels - 1)].add(
            jnp.where(done[..., None], state.radiance, 0.0))

        # Regenerate: hand each finished lane the next unstarted pixel.
        slot = jnp.cumsum(done.astype(jnp.int32)) - 1
        new_idx = next_pixel + slot
        refill = done & (new_idx < pixel_end)
        pixel_idx = jnp.where(refill, new_idx,
                              jnp.where(done, pixel_end, pixel_idx))
        next_pixel = jnp.minimum(
            next_pixel + jnp.sum(done.astype(jnp.int32)), pixel_end)

        fresh = _make_camera_lanes(camera, pixel_idx, width, height,
                                   accumulation, pixel_end)
        state = _PathState(*(
            jnp.where(refill.reshape(refill.shape + (1,) * (f.ndim - 1)),
                      f, s)
            for f, s in zip(fresh, state)))

        return state, pixel_idx, accum, next_pixel, it + 1, rays

    _, _, accum, _, it, rays = jax.lax.while_loop(
        cond, body,
        (state0, pixel_idx0, accum0, pixel_start + r, jnp.int32(0),
         jnp.uint32(0)))
    if with_iters:
        return accum, rays, it
    return accum, rays


@partial(jax.jit, static_argnames=("width", "height", "settings", "pool_size"))
def render_sample_pooled(scene: RenderScene, camera: PinholeCamera,
                         width: int, height: int, accumulation,
                         settings: RenderSettings = RenderSettings(),
                         pool_size: int = 65536):
    """One progressive frame through the pooled wavefront
    (:func:`render_pixels_pooled`) → radiance [height, width, 3]."""
    accum, _ = render_pixels_pooled(scene, camera, width, height,
                                    accumulation, settings, pool_size)
    return accum.reshape(height, width, 3)


@partial(jax.jit, static_argnames=("width", "height", "settings", "pool_size"))
def render_sample_pooled_counted(scene: RenderScene, camera: PinholeCamera,
                                 width: int, height: int, accumulation,
                                 settings: RenderSettings = RenderSettings(),
                                 pool_size: int = 65536):
    """Like :func:`render_sample_pooled` but also returns the exact in-run
    ray count (live lanes × 2 per iteration) — used by bench.py."""
    accum, rays = render_pixels_pooled(scene, camera, width, height,
                                       accumulation, settings, pool_size)
    return accum.reshape(height, width, 3), rays


@partial(jax.jit, static_argnames=("width", "height", "settings"))
def render_sample(scene: RenderScene, camera: PinholeCamera,
                  width: int, height: int, accumulation,
                  settings: RenderSettings = RenderSettings()):
    """One progressive frame → radiance [height, width, 3] (row 0 = top)."""
    x = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.uint32)[None, :], (height, width))
    y = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.uint32)[:, None], (height, width))
    return render_sample_pixels(
        scene, camera, x, y, width, height, accumulation, settings)


def render_rays(scene: RenderScene, origin, direction, pixel_hash,
                accumulation, settings: RenderSettings = RenderSettings()):
    """Trace explicit rays through the full estimator → radiance [r, 3].

    The ray-level entry the edge-sampled geometry gradients probe with:
    silhouette probes need EXACT sub-pixel viewport positions, which the
    pixel-indexed entries quantize away. ``pixel_hash`` keys the Sobol
    chains — probe pairs pass the SAME hash so the stochastic noise is
    common-mode and cancels in their radiance difference.
    """
    accumulation = jnp.asarray(accumulation, jnp.uint32)
    r = origin.shape[0]
    state = _PathState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((r, 3), jnp.float32),
        radiance=jnp.zeros((r, 3), jnp.float32),
        bsdf_pdf=jnp.zeros(r, jnp.float32),
        bsdf_was_delta=jnp.ones(r, bool),
        pixel_hash=jnp.broadcast_to(jnp.asarray(pixel_hash, jnp.uint32),
                                    (r,)),
        bounce=jnp.zeros(r, jnp.uint32),
        active=jnp.isfinite(origin[..., 0]),
    )
    n_iters = settings.max_bounce_count + 1 + settings.passthrough_slack
    step = partial(_wavefront_step, scene, settings, accumulation)
    state = jax.lax.fori_loop(0, n_iters, lambda i, s: step(s), state)
    return state.radiance


_EXPLAINED_PATHS = set()


def explain_render_path(scene: RenderScene,
                        settings: RenderSettings = RenderSettings()) -> str:
    """One-line description of which forward path `render_sample_fast`
    takes for this scene/settings and, for the wavefront, WHY the 10×
    faster megakernel was disqualified (VERDICT r4 #6).

    Examples: ``"megakernel"``,
    ``"wavefront: environment map, tint-roughness textures"``.
    """
    import jax
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)
    reasons = megakernel_ineligibility_reasons(scene, settings)
    if jax.default_backend() != "tpu":
        reasons = [f"backend is {jax.default_backend()}, not tpu"] + reasons
    if not reasons:
        from bifrost3d_tpu.integrator.pallas_mesh import MAX_TRIS
        if int(scene.tri_verts.shape[0]) > MAX_TRIS:
            return "megakernel (hier: cluster-BVH DMA trace)"
        return "megakernel"
    return "wavefront: " + ", ".join(reasons)


def render_sample_fast(scene: RenderScene, camera: PinholeCamera,
                       width: int, height: int, accumulation,
                       settings: RenderSettings = RenderSettings(),
                       pool_size: int = 65536):
    """Fastest forward frame for the current backend/scene — the product
    dispatch (static, costs nothing under jit):

    - TPU + megakernel-eligible scene → the Pallas mesh megakernel
      (integrator/pallas_mesh.py): the whole path in one kernel, ~10× the
      pooled wavefront on the CornellBox flagship.
    - otherwise → the pooled compacting wavefront (the r3 product path).

    The chosen path (and the first disqualifying features) is logged at
    INFO once per scene identity — see :func:`explain_render_path`.
    Forward-only; the differentiable path stays :func:`render_sample`.
    """
    import jax
    mega = False
    if jax.default_backend() == "tpu":
        from bifrost3d_tpu.integrator.pallas_mesh import (
            mesh_megakernel_eligible, render_mesh_megakernel)
        mega = mesh_megakernel_eligible(scene, settings)
    key = (id(scene.tri_verts), id(scene.materials.tint), mega)
    if key not in _EXPLAINED_PATHS:
        if len(_EXPLAINED_PATHS) > 256:
            _EXPLAINED_PATHS.clear()
        _EXPLAINED_PATHS.add(key)
        try:
            logging.getLogger(__name__).info(
                "render path: %s", explain_render_path(scene, settings))
        except Exception:
            pass  # never let diagnostics break rendering (traced scenes)
    if mega:
        img, _ = render_mesh_megakernel(scene, camera, width, height,
                                        accumulation, settings)
        return img
    return render_sample_pooled(scene, camera, width, height,
                                accumulation, settings, pool_size)


def render_progressive(scene: RenderScene, camera: PinholeCamera,
                       width: int, height: int, accumulations: int,
                       settings: RenderSettings = RenderSettings(),
                       pool_size: int = 65536,
                       high_precision: bool = False):
    """Progressive accumulation (lerp 1/(n+1), SimpleRGPs.cu:74-107).

    Forward product path: each sample renders through
    :func:`render_sample_fast` (mesh megakernel on TPU where eligible,
    pooled compacting wavefront otherwise).

    ``high_precision`` is the counterpart of the reference's
    DOUBLE_PRECISION_ACCUMULATION_BUFFER (Defines.h:14,
    SimpleRGPs.cu:74-107): instead of an emulated f64 buffer (slow on
    TPU), the running SUM is kept in Kahan-compensated f32 — a (sum,
    compensation) pair whose error bound matches a double accumulator for
    the 8192-sample golden counts — and divided once at the end.
    """
    if high_precision:
        total = jnp.zeros((height, width, 3), jnp.float32)
        comp = jnp.zeros((height, width, 3), jnp.float32)
        for n in range(accumulations):
            frame = render_sample_fast(scene, camera, width, height, n,
                                       settings, pool_size)
            y = frame - comp
            t = total + y
            comp = (t - total) - y
            total = t
        return total / max(accumulations, 1)
    buffer = jnp.zeros((height, width, 3), jnp.float32)
    for n in range(accumulations):
        frame = render_sample_fast(scene, camera, width, height, n,
                                   settings, pool_size)
        buffer = buffer + (frame - buffer) / (n + 1)
    return buffer
