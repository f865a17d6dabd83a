"""Mesh megakernel (integrator/pallas_mesh.py) vs the XLA wavefront.

The kernel mirrors render_sample's estimator exactly (same Sobol chains,
same RIS reservoir, same clamps); agreement is f32-noise-level — op
reassociation and the in-kernel uint→float conversion can flip individual
stochastic decisions on rare lanes, so the gates are statistical: matching
means and a small decision-flip fraction, not bitwise equality.

Runs in Pallas interpret mode on CPU (the same kernel source compiles for
TPU; SURVEY.md §4's "GPU kernels tested on CPU" idea).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.apps.scenes import (
    create_cornell_box, create_veach_scene)
from bifrost3d_tpu.integrator.path_tracer import (
    RenderSettings, render_sample, settings_for_scene)
from bifrost3d_tpu.integrator.pallas_mesh import (
    mesh_megakernel_eligible, render_mesh_megakernel)


def _compare(scene, cam, settings, res=32, accumulation=0,
             flip_budget=0.03):
    img, rays = render_mesh_megakernel(
        scene, cam, res, res, jnp.uint32(accumulation), settings,
        interpret=True)
    img = np.asarray(img)
    ref = np.asarray(render_sample(scene, cam, res, res,
                                   jnp.uint32(accumulation), settings))
    assert np.isfinite(img).all()
    assert float(rays) > 0
    d = np.abs(img - ref)
    flips = (d.max(axis=-1) > 1e-3).mean()
    assert flips < flip_budget, flips
    # Pixels that didn't flip agree tightly.
    agree = d.max(axis=-1) <= 1e-3
    assert agree.mean() > 1.0 - flip_budget
    assert abs(img.mean() - ref.mean()) < 0.02 * max(ref.mean(), 1e-3)
    return img, ref


def test_cornell_eligible_and_matches_wavefront():
    scene, cam = create_cornell_box()
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings)
    img, ref = _compare(scene, cam, settings)
    assert img.mean() > 0.05  # actually lit


def test_cornell_second_accumulation():
    scene, cam = create_cornell_box()
    settings = settings_for_scene(scene, max_bounce_count=2)
    _compare(scene, cam, settings, accumulation=3)


def test_veach_eligible_and_matches_wavefront():
    scene, cam = create_veach_scene()
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings)
    _compare(scene, cam, settings)


def test_opacity_scene_textured_cutout_matches_wavefront():
    """Opacity.h: checkered-floor texture, 17x17 cutout grid box, and
    coverage-0.75 thin planes — exercises the r5 megakernel texture fetch,
    cutout binarization, stochastic transparency, and the coverage-aware
    shadow march (VERDICT r4 #2)."""
    from bifrost3d_tpu.apps.scenes import create_opacity_scene
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)
    scene, cam = create_opacity_scene()
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, _ = _compare(scene, cam, settings)
    # The light sits INSIDE the cutout box — single-sample frames are dim
    # but must not be black (grid holes + the lit floor patch).
    assert img.mean() > 1e-4


def test_textured_cornell_eligible_and_matches():
    """A Cornell-style room over the Utils.cpp checkered floor texture —
    the 'textured Cornell' VERDICT r4 #2 names as the widening gate."""
    from bifrost3d_tpu.apps.scenes import _checkered_floor_parts, _trs
    from bifrost3d_tpu.geometry.creation import make_box
    from bifrost3d_tpu.io.texture import TextureBank
    from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
    from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
    from bifrost3d_tpu.scene.render_scene import build_render_scene
    from bifrost3d_tpu.scene.camera import perspective_camera
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)

    floor_mesh, floor_mat, floor_tex = _checkered_floor_parts(
        floor_size=4.0, checker_size=0.5)
    textures = TextureBank.build([floor_tex])
    floor_mat["tint_roughness_texture"] = 0
    mats = MaterialArray.build([
        floor_mat, dielectric((0.6, 0.3, 0.2), 0.4)])
    instances = [
        (floor_mesh, 0, _trs((0, -0.5, 0))),
        (make_box(size=0.6), 1, _trs((0, -0.2, 0.3))),
    ]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0.0, 1.4, -0.5),
         "radius": 0.2, "power": (30.0,) * 3}])
    scene = build_render_scene(instances, mats, lights, textures=textures)
    cam = perspective_camera(eye=(0, 0.6, -2.2), target=(0, -0.2, 0),
                             fov_radians=np.pi / 4, aspect=1.0)
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, ref = _compare(scene, cam, settings)
    assert img.mean() > 0.005
    # The checker actually shows: floor row luminance alternates.
    row = img[-4]
    assert row.max() > 2.0 * max(row.min(), 1e-4)


def test_sphere_scene_environment_matches_wavefront():
    """Sphere.h: a sphere on a plane under a latlong environment map —
    exercises the r5 megakernel env path: bilinear miss eval with MIS
    (per-pixel pdf table) and presampled-pool NEE (the reference's
    default env NEE, Defines.h:15)."""
    from bifrost3d_tpu.apps.scenes import create_sphere_scene
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)
    scene, cam = create_sphere_scene()
    assert scene.environment is not None
    assert scene.environment_presampled is not None
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, _ = _compare(scene, cam, settings)
    assert img.mean() > 0.1  # sky fills most of the frame


def test_coated_materials_match_wavefront():
    """Coat layer parity: coat-modulated roughness, re-based specularity,
    and the third GGX lobe (DefaultShading.h:66-178) in tile form."""
    from bifrost3d_tpu.apps.scenes import _trs
    from bifrost3d_tpu.geometry.creation import make_box, make_plane, make_sphere
    from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
    from bifrost3d_tpu.scene.materials import MaterialArray, dielectric, metal
    from bifrost3d_tpu.scene.render_scene import build_render_scene
    from bifrost3d_tpu.scene.camera import perspective_camera
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)

    mats = MaterialArray.build([
        dielectric((0.6, 0.6, 0.6), 0.9),
        dielectric((0.2, 0.4, 0.8), 0.1, coat=1.0, coat_roughness=0.0),
        metal((0.95, 0.64, 0.54), 0.5, coat=0.7, coat_roughness=0.3),
    ])
    instances = [
        (make_plane(size=8.0), 0, _trs((0, -0.5, 0))),
        (make_box(size=0.7), 1, _trs((-0.6, -0.15, 0.3))),
        (make_sphere(radius=0.4, slices=12, stacks=8), 2,
         _trs((0.7, -0.1, 0.0))),
    ]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (1.5, 3.0, -2.0),
         "radius": 0.4, "power": (120.0,) * 3}])
    scene = build_render_scene(instances, mats, lights)
    cam = perspective_camera(eye=(0, 0.8, -2.6), target=(0, -0.1, 0),
                             fov_radians=np.pi / 4, aspect=1.0)
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, _ = _compare(scene, cam, settings)
    assert img.mean() > 0.01


def test_spot_light_matches_wavefront():
    """Spot lights (disk-or-cone NEE sampling, disk intersection for BSDF
    rays with MIS — SpotLightImpl.h:77-131, LightSources.cu:40-41)."""
    from bifrost3d_tpu.apps.scenes import _trs
    from bifrost3d_tpu.geometry.creation import make_box, make_plane
    from bifrost3d_tpu.lights.types import LIGHT_SPOT, LightArray
    from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
    from bifrost3d_tpu.scene.render_scene import build_render_scene
    from bifrost3d_tpu.scene.camera import perspective_camera
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)

    mats = MaterialArray.build([
        dielectric((0.7, 0.7, 0.7), 0.8),
        dielectric((0.7, 0.2, 0.2), 0.3)])
    instances = [
        (make_plane(size=10.0), 0, _trs((0, -0.5, 0))),
        (make_box(size=0.6), 1, _trs((0, -0.2, 0.2)))]
    down = np.asarray([0.2, -1.0, 0.3], np.float32)
    down /= np.linalg.norm(down)
    lights = LightArray.build([
        {"kind": LIGHT_SPOT, "position": (0.5, 2.5, -0.5),
         "radius": 0.3, "direction": tuple(down),
         "cos_angle": 0.8, "power": (120.0,) * 3}])
    scene = build_render_scene(instances, mats, lights)
    cam = perspective_camera(eye=(0, 0.8, -2.6), target=(0, -0.1, 0),
                             fov_radians=np.pi / 4, aspect=1.0)
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, _ = _compare(scene, cam, settings)
    assert img.mean() > 0.005


def test_diffuse_shading_model_matches_wavefront():
    """Per-lane shading-model dispatch: Diffuse (EON-only,
    DiffuseShading.h:21-50) materials mixed with Default ones."""
    from bifrost3d_tpu.apps.scenes import _trs
    from bifrost3d_tpu.geometry.creation import make_box, make_plane
    from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
    from bifrost3d_tpu.scene.materials import MaterialArray, dielectric
    from bifrost3d_tpu.scene.render_scene import build_render_scene
    from bifrost3d_tpu.scene.camera import perspective_camera
    from bifrost3d_tpu.integrator.pallas_mesh import (
        megakernel_ineligibility_reasons)

    mats = MaterialArray.build([
        dielectric((0.7, 0.7, 0.7), 0.8),
        dict(tint=(0.2, 0.6, 0.3), roughness=0.6, shading_model=1),
    ])
    instances = [
        (make_plane(size=10.0), 0, _trs((0, -0.5, 0))),
        (make_box(size=0.6), 1, _trs((0, -0.2, 0.2)))]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (1.0, 3.0, -1.5),
         "radius": 0.4, "power": (100.0,) * 3}])
    scene = build_render_scene(instances, mats, lights)
    cam = perspective_camera(eye=(0, 0.8, -2.6), target=(0, -0.1, 0),
                             fov_radians=np.pi / 4, aspect=1.0)
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert settings.shading_models_present == (0, 1)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, _ = _compare(scene, cam, settings)
    assert img.mean() > 0.01


def test_ineligible_scenes_fall_back():
    from bifrost3d_tpu.apps.scenes import create_glass_scene
    scene, _ = create_glass_scene()  # transmissive shading model
    settings = settings_for_scene(scene)
    assert not mesh_megakernel_eligible(scene, settings)


def test_path_regularization_gates_out():
    scene, _ = create_cornell_box()
    settings = settings_for_scene(scene, path_regularization_scale=1.0)
    assert not mesh_megakernel_eligible(scene, settings)


def test_render_sample_fast_dispatch():
    """render_sample_fast falls back to the pooled wavefront on CPU (no
    TPU in tests) and must accept eligible and ineligible scenes alike."""
    from bifrost3d_tpu.integrator.path_tracer import (
        render_sample_fast, render_sample_pooled)
    scene, cam = create_cornell_box()
    settings = settings_for_scene(scene, max_bounce_count=1)
    img = render_sample_fast(scene, cam, 16, 16, jnp.uint32(0), settings)
    ref = render_sample_pooled(scene, cam, 16, 16, jnp.uint32(0), settings)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref))


def test_veach_mesh_light_emission_path():
    """The Veach mesh-light variant exercises surface EMISSION in the
    kernel (emissive quads replacing sphere lights)."""
    from bifrost3d_tpu.apps.scenes import create_veach_scene
    scene, cam = create_veach_scene(with_mesh_light=True)
    settings = settings_for_scene(scene, max_bounce_count=2)
    # Hard gate, not a skip: if the mesh-light Veach scene ever falls out
    # of megakernel scope this parity test must FAIL, otherwise a scope
    # regression silently converts the gate into a no-op (VERDICT r4 #5).
    assert mesh_megakernel_eligible(scene, settings), (
        "mesh-light Veach scene fell out of megakernel scope")
    _compare(scene, cam, settings)


# ---------------------------------------------------------------------------
# Hierarchical (DMA-streamed) megakernel: scenes above the dense MAX_TRIS
# ---------------------------------------------------------------------------

def _mid_size_scene(slices=40, stacks=20):
    """~2.5k-triangle sphere scene — above MAX_TRIS (dense VMEM trace),
    well inside HIER_MAX_TRIS (cluster-BVH DMA trace)."""
    from bifrost3d_tpu.apps.scenes import _trs
    from bifrost3d_tpu.geometry.creation import (make_box, make_plane,
                                                 make_sphere)
    from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
    from bifrost3d_tpu.scene.materials import MaterialArray, dielectric, metal
    from bifrost3d_tpu.scene.render_scene import build_render_scene
    from bifrost3d_tpu.scene.camera import perspective_camera

    mats = MaterialArray.build([
        dielectric((0.7, 0.7, 0.7), 0.6),
        metal((0.95, 0.64, 0.54), 0.3),
        dielectric((0.2, 0.4, 0.8), 0.2),
    ])
    instances = [
        (make_plane(size=4.0), 0, _trs((0, -0.5, 0))),
        (make_sphere(slices=slices, stacks=stacks), 1,
         _trs((-0.5, 0.0, 0.2))),
        (make_sphere(slices=32, stacks=16), 2, _trs((0.6, -0.1, -0.2))),
        (make_box(size=0.5), 0, _trs((0.0, -0.3, -0.8))),
    ]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0.0, 1.6, 0.5),
         "radius": 0.2, "power": (40.0,) * 3}])
    scene = build_render_scene(instances, mats, lights)
    cam = perspective_camera((0.0, 0.6, 2.4), (0.0, -0.1, 0.0))
    return scene, cam


def test_hier_pack_slot_tables_consistent():
    """The slot-major triangle table, slot-ordered attrs, and SMEM boxes
    must agree with the pack_hierarchical product (VERDICT r4 #3: one
    accel path across all scene sizes, Renderer.cpp:161-182)."""
    from bifrost3d_tpu.geometry.pallas_bvh import pack_hierarchical
    from bifrost3d_tpu.integrator.pallas_mesh import (
        HIER_CLUSTER, MAX_TRIS, _pack_scene)

    scene, _ = _mid_size_scene()
    t = int(scene.tri_verts.shape[0])
    assert t > MAX_TRIS
    packed = _pack_scene(scene)
    assert packed["hier"]
    hp = pack_hierarchical(np.asarray(scene.tri_verts), scene.bvh,
                           cluster_t=HIER_CLUSTER)
    comp = np.asarray(hp.tri_components)
    tri = np.asarray(packed["tri"])
    assert tri.shape == (comp.shape[1], 128)
    np.testing.assert_array_equal(tri[:, 0:9], comp[0:9].T)
    assert np.all(tri[:, 9:] == 0.0)
    # Attr columns must be the original attrs re-gathered by slot order.
    order = np.asarray(hp.order)
    attr = np.asarray(packed["attr"])
    tvs = np.asarray(scene.tri_verts)
    mat = np.asarray(scene.tri_material)
    valid = np.abs(comp[3:9]).sum(axis=0) > 0
    np.testing.assert_array_equal(attr[9, valid],
                                  mat[order[valid]].astype(np.float32))
    # SMEM boxes mirror the node table's first 6 lanes.
    boxes = np.asarray(packed["boxes"])
    nb = np.asarray(hp.node_boxes)
    np.testing.assert_array_equal(boxes, nb[:, 0:6].T)


def test_hier_scene_eligible_and_matches_wavefront():
    """Full-path parity of the DMA-streamed hier megakernel against the
    XLA wavefront on a 2.5k-tri scene (interpret mode). This is the
    bridge across the former 1024-triangle cliff: trace, shadow rays, and
    the in-walk attribute merge all run the cluster-BVH path."""
    from bifrost3d_tpu.integrator.pallas_mesh import (
        MAX_TRIS, megakernel_ineligibility_reasons)

    scene, cam = _mid_size_scene()
    assert int(scene.tri_verts.shape[0]) > MAX_TRIS
    settings = settings_for_scene(scene, max_bounce_count=2)
    assert mesh_megakernel_eligible(scene, settings), \
        megakernel_ineligibility_reasons(scene, settings)
    img, _ = _compare(scene, cam, settings)
    assert img.mean() > 0.01


def test_hier_tri_cap_gates_out():
    from bifrost3d_tpu.integrator.pallas_mesh import (
        HIER_MAX_TRIS, megakernel_ineligibility_reasons)
    scene, _ = _mid_size_scene()
    fake = scene._replace(tri_verts=jnp.zeros((HIER_MAX_TRIS + 1, 3, 3),
                                              jnp.float32))
    settings = settings_for_scene(scene)
    reasons = megakernel_ineligibility_reasons(fake, settings)
    assert any("HIER_MAX_TRIS" in r for r in reasons), reasons
