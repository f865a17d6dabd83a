"""Built-in test scenes.

Counterparts of the reference's SimpleViewer scenes
(``apps/SimpleViewer/Scenes/*``, SURVEY.md §2.7): CornellBox (faithful to
CornellBox.h:23-120 — 1-unit thin-walled room, iron + copper boxes, sphere
light), MaterialScene (seven Mori shader balls sweeping dielectric→gold), Veach MIS
scene (plates of varying roughness under lights of varying size), plus
Sphere / SphereLight / Glass / Opacity / Test scenes.

Each builder returns (RenderScene, PinholeCamera).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.geometry import make_box, make_plane, make_sphere, transform_mesh
from bifrost3d_tpu.lights.types import LIGHT_DIRECTIONAL, LIGHT_SPHERE, LightArray
from bifrost3d_tpu.math.quaternion import quat_from_axis_angle, quat_to_matrix
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import (
    COPPER_TINT,
    FLAG_CUTOUT,
    FLAG_THIN_WALLED,
    GOLD_TINT,
    IRON_TINT,
    MaterialArray,
    dielectric,
    emissive,
    metal,
    transmissive,
)
from bifrost3d_tpu.scene.render_scene import build_render_scene
from bifrost3d_tpu.utils.hostbuild import host_build

F32 = np.float32


def _trs(translation=(0, 0, 0), axis=None, angle=0.0, scale=1.0):
    """3x4 affine from translation + axis-angle + uniform scale."""
    if axis is None:
        rot = np.eye(3, dtype=F32)
    else:
        q = quat_from_axis_angle(jnp.asarray(axis, jnp.float32), angle)
        rot = np.asarray(quat_to_matrix(q), F32)
    m = np.zeros((3, 4), F32)
    m[:, :3] = rot * scale
    m[:, 3] = translation
    return m


PI = float(np.pi)
HALF_PI = PI / 2


@host_build
def create_cornell_box(environment_map=None, aspect=1.0):
    """CornellBox.h:23-120: red/green/white thin-walled 1-unit room, iron
    small box, copper tall box, sphere light (power 2, r 0.05) at ceiling."""
    mats = MaterialArray.build([
        dielectric((0.98, 0.98, 0.98), 1.0, 0.02, flags=FLAG_THIN_WALLED),
        dielectric((0.98, 0.02, 0.02), 1.0, 0.02, flags=FLAG_THIN_WALLED),
        dielectric((0.02, 0.98, 0.02), 1.0, 0.02, flags=FLAG_THIN_WALLED),
        metal(IRON_TINT, 0.4),
        metal(COPPER_TINT, 0.02),
    ])
    plane = make_plane(size=1.0)
    box = make_box(size=1.0)
    tall_box = transform_mesh(box, np.asarray(
        [[1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 1, 0]], F32))

    forward = (0, 0, 1)
    right = (1, 0, 0)
    up = (0, 1, 0)
    instances = [
        (plane, 0, _trs((0, -0.5, 0))),                              # floor
        (plane, 0, _trs((0, 0.5, 0), forward, PI)),                  # roof
        (plane, 0, _trs((0, 0, 0.5), right, -HALF_PI)),              # back
        (plane, 1, _trs((-0.5, 0, 0), forward, -HALF_PI)),           # left red
        (plane, 2, _trs((0.5, 0, 0), forward, HALF_PI)),             # right green
        (box, 3, _trs((0.2, -0.35, -0.2), up, PI / 6, 0.3)),         # iron box
        (tall_box, 4, _trs((-0.2, -0.2, 0.2), up, -PI / 6, 0.3)),    # copper box
    ]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0.0, 0.45, 0.0), "radius": 0.05,
         "power": (2.0, 2.0, 2.0)}])
    scene = build_render_scene(instances, mats, lights,
                               environment_map=environment_map)
    camera = perspective_camera(eye=(0, 0, -1.5), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=aspect)
    return scene, camera


SHADERBALL_PATH = os.environ.get(
    "BIFROST_SHADERBALL",
    "/root/reference/apps/SimpleViewer/Resources/Shaderball.gltf")

MATERIAL_SCENE_COUNT = 7  # MaterialGUI::material_count (Material.cpp:20)


def _load_shader_ball_meshes():
    """Scenes/Utils.cpp load_shader_ball: keep Node5 (outside, gets the
    test material) and Node2 (inside, rubber); drop the rest. Returns
    (outside_mesh, inside_mesh) or None when the asset isn't available."""
    if not os.path.exists(SHADERBALL_PATH):
        return None
    from bifrost3d_tpu.io.gltf import load_gltf
    meshes = load_gltf(SHADERBALL_PATH, load_textures=False)[0]
    by_name = {name: mesh for mesh, _, name in meshes}
    if "Node5" not in by_name or "Node2" not in by_name:
        return None
    return by_name["Node5"], by_name["Node2"]


@host_build
def create_material_scene(environment_map=None, aspect=1.0):
    """Material.cpp create_material_scene: seven Mori shader balls sweeping
    from a teal dielectric (roughness 1) to gold metal (roughness 0.02),
    rubber inside, on the checkered floor, lit by one directional light."""
    mat0 = dict(tint=(0.02, 0.27, 0.33), roughness=1.0, specularity=0.04,
                metallic=0.0)
    mat1 = dict(tint=GOLD_TINT, roughness=0.02, specularity=0.04,
                metallic=1.0)

    floor_mesh, floor_mat, floor_tex = _checkered_floor_parts()
    from bifrost3d_tpu.io.texture import TextureBank
    textures = TextureBank.build([floor_tex])
    floor_mat["tint_roughness_texture"] = 0

    material_dicts = [floor_mat, dielectric((0.05, 0.05, 0.05), 1.0)]
    n = MATERIAL_SCENE_COUNT
    for m in range(n):
        t = m / (n - 1.0)
        material_dicts.append(dict(
            tint=tuple(np.asarray(mat0["tint"]) * (1 - t)
                       + np.asarray(mat1["tint"]) * t),
            roughness=mat0["roughness"] * (1 - t) + mat1["roughness"] * t,
            specularity=0.04,
            metallic=t))
    mats = MaterialArray.build(material_dicts)

    instances = [(floor_mesh, 0, _trs((0, -1.0, 0)))]
    ball = _load_shader_ball_meshes()
    spacing = 1.2
    x0 = -spacing * 0.5 * (n - 1)
    for m in range(n):
        x = x0 + m * spacing
        if ball is not None:
            outside, inside = ball
            instances.append((outside, 2 + m, _trs((x, 0, 0), scale=2.0)))
            instances.append((inside, 1, _trs((x, 0, 0), scale=2.0)))
        else:  # asset not mounted: spheres keep the scene usable
            instances.append((make_sphere(radius=0.5, slices=32, stacks=16),
                              2 + m, _trs((x, 0.0, 0))))

    # Directional light from (20, 20, -20) toward the origin
    # (Material.cpp:141-146), radiance (3, 2.9, 2.5).
    ldir = -np.asarray([20.0, 20.0, -20.0], F32)
    ldir /= np.linalg.norm(ldir)
    lights = LightArray.build([
        {"kind": LIGHT_DIRECTIONAL, "direction": tuple(ldir),
         "radiance": (3.0, 2.9, 2.5)}])
    scene = build_render_scene(instances, mats, lights,
                               environment_map=environment_map,
                               textures=textures)
    camera = perspective_camera(
        eye=(0, 5.5, -18.5), target=(0, 0.5, 0), fov_radians=PI / 4,
        aspect=aspect)
    return scene, camera


@host_build
def create_legacy_material_scene(aspect=1.0, box_size=1.0,
                                 sphere_radius=0.5, spacing=1.2,
                                 floor_tint=(0.72, 0.72, 0.72),
                                 floor_roughness=0.08,
                                 checker_size=0.60,
                                 floor_shift=(0.0, 0.10),
                                 eye=(0.0, 1.2, -10.8),
                                 target=(0.0, 0.35, 0.0)):
    """The GOLDEN-ERA MaterialScene: nine spheres-on-boxes lerping the
    teal dielectric → gold metal over the checkered floor, one directional
    light — the scene revision ReferenceImages/MaterialScene_2048.png was
    rendered from (it predates Material.cpp:28's seven shader balls; the
    PNG shows 9 sphere-on-box pedestals). Geometry reconstructed from the
    PNG against the unchanged camera/light of create_material_scene; the
    strict golden gate in tests/test_golden.py pins the reconstruction."""
    n = 9
    mat0 = dict(tint=(0.02, 0.27, 0.33), roughness=1.0, specularity=0.04,
                metallic=0.0)
    mat1 = dict(tint=GOLD_TINT, roughness=0.02, specularity=0.04,
                metallic=1.0)

    floor_mesh, floor_mat, floor_tex = _checkered_floor_parts(
        checker_size=checker_size, tint=floor_tint,
        roughness=floor_roughness)
    from bifrost3d_tpu.io.texture import TextureBank
    textures = TextureBank.build([floor_tex])
    floor_mat["tint_roughness_texture"] = 0

    material_dicts = [floor_mat]
    for m in range(n):
        t = m / (n - 1.0)
        material_dicts.append(dict(
            tint=tuple(np.asarray(mat0["tint"]) * (1 - t)
                       + np.asarray(mat1["tint"]) * t),
            roughness=mat0["roughness"] * (1 - t) + mat1["roughness"] * t,
            specularity=0.04,
            metallic=t))
    mats = MaterialArray.build(material_dicts)

    instances = [(floor_mesh, 0,
                  _trs((floor_shift[0], -1.0, floor_shift[1])))]
    x0 = -spacing * 0.5 * (n - 1)
    box_y = -1.0 + box_size * 0.5
    sphere_y = -1.0 + box_size + sphere_radius
    for m in range(n):
        x = x0 + m * spacing
        instances.append((make_box(size=box_size), 1 + m,
                          _trs((x, box_y, 0))))
        instances.append((make_sphere(radius=sphere_radius, slices=32,
                                      stacks=16), 1 + m,
                          _trs((x, sphere_y, 0))))

    ldir = -np.asarray([20.0, 20.0, -20.0], F32)
    ldir /= np.linalg.norm(ldir)
    lights = LightArray.build([
        {"kind": LIGHT_DIRECTIONAL, "direction": tuple(ldir),
         "radiance": (3.0, 2.9, 2.5)}])
    scene = build_render_scene(instances, mats, lights, textures=textures)
    camera = perspective_camera(
        eye=eye, target=target, fov_radians=PI / 4, aspect=aspect)
    return scene, camera


@host_build
def create_veach_scene(with_mesh_light: bool = False, aspect=1.0):
    """Veach.h:27: the classic MIS scene — four increasingly rough plates
    reflecting three sphere lights of increasing size and equal power."""
    material_dicts = [dielectric((0.4, 0.4, 0.4), 0.9)]
    instances = [
        (make_plane(size=40.0), 0, _trs((0, 0, 0))),
        (make_plane(size=40.0), 0, _trs((0, 0, -10), (1, 0, 0), -HALF_PI)),
    ]
    plate = make_plane(size=1.0)
    plate = transform_mesh(plate, np.asarray(
        [[4.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1.0, 0]], F32))
    roughnesses = [0.005, 0.02, 0.05, 0.1]
    for i, rough in enumerate(roughnesses):
        material_dicts.append(metal((0.9, 0.9, 0.9), rough))
        angle = 0.25 + 0.18 * i
        z = -1.0 - 1.05 * i
        y = 0.25 + 0.5 * i
        instances.append((
            plate, len(material_dicts) - 1,
            _trs((0, y, z), (1, 0, 0), -angle)))
    mats = MaterialArray.build(material_dicts)
    power = 30.0
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (-2.5, 5.0, -6.0), "radius": 0.03,
         "power": (power, power, power)},
        {"kind": LIGHT_SPHERE, "position": (0.0, 5.0, -6.0), "radius": 0.3,
         "power": (power, power, power)},
        {"kind": LIGHT_SPHERE, "position": (2.5, 5.0, -6.0), "radius": 0.9,
         "power": (power, power, power)},
    ])
    scene = build_render_scene(instances, mats, lights)
    camera = perspective_camera(
        eye=(0, 3.0, 3.0), target=(0, 1.8, -3.0), fov_radians=PI / 4,
        aspect=aspect)
    return scene, camera


@host_build
def create_sphere_scene(aspect=1.0):
    """Sphere.h: a single sphere on a plane under an environment."""
    mats = MaterialArray.build([
        dielectric((0.5, 0.5, 0.5), 0.8),
        dielectric((0.8, 0.2, 0.2), 0.3)])
    instances = [
        (make_plane(size=20.0), 0, _trs((0, -0.5, 0))),
        (make_sphere(radius=0.5), 1, _trs((0, 0, 0)))]
    env = np.full((16, 32, 3), 0.8, F32)
    scene = build_render_scene(instances, mats, environment_map=env,
                               presample_environment=8192)
    camera = perspective_camera(eye=(0, 0.5, -2.5), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=aspect)
    return scene, camera


@host_build
def create_sphere_light_scene(aspect=1.0):
    """SphereLight.h: a diffuse sphere lit by a large nearby sphere light."""
    mats = MaterialArray.build([dielectric((0.8, 0.8, 0.8), 0.7)])
    instances = [(make_sphere(radius=0.5), 0, _trs((0, 0, 0)))]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (1.5, 1.0, -1.0), "radius": 0.5,
         "power": (40.0, 40.0, 40.0)}])
    scene = build_render_scene(instances, mats, lights)
    camera = perspective_camera(eye=(0, 0.5, -2.5), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=aspect)
    return scene, camera


@host_build
def create_glass_scene(aspect=1.0):
    """GlassScene.h analogue: transmissive spheres over a checker-ish floor."""
    mats = MaterialArray.build([
        dielectric((0.6, 0.6, 0.6), 0.9),
        transmissive((0.95, 0.95, 0.95), 0.0),
        transmissive((0.9, 0.5, 0.4), 0.15)])
    instances = [
        (make_plane(size=20.0), 0, _trs((0, -0.5, 0))),
        (make_sphere(radius=0.5), 1, _trs((-0.7, 0.0, 0))),
        (make_sphere(radius=0.5), 2, _trs((0.7, 0.0, 0)))]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0, 4.0, -2.0), "radius": 0.5,
         "power": (150.0, 150.0, 150.0)}])
    env = np.full((16, 32, 3), 0.3, F32)
    scene = build_render_scene(instances, mats, lights, environment_map=env,
                               presample_environment=8192)
    camera = perspective_camera(eye=(0, 0.6, -3.0), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=aspect)
    return scene, camera


def _checkered_floor_parts(floor_size=400.0, checker_size=1.0,
                           tint=(0.02, 0.27, 0.33), roughness=0.3):
    """Scenes/Utils.cpp create_checkered_floor: a thin-walled plane with a
    2x2 sRGB checker tint-roughness texture repeated across the floor.
    Returns (mesh, material_dict, texture_dict)."""
    from bifrost3d_tpu.io.texture import FILTER_NONE
    from bifrost3d_tpu.math.color import srgb_to_linear

    checker = np.zeros((2, 2, 4), F32)
    for y in range(2):
        for x in range(2):
            is_black = (x & 1) != (y & 1)
            intensity = 1 / 255.0 if is_black else 1.0
            checker[y, x, :3] = float(srgb_to_linear(intensity))
            checker[y, x, 3] = 15 / 255.0 if is_black else 1.0
    texture = {"image": checker, "filter": FILTER_NONE}

    mesh = make_plane(size=floor_size)
    # Texcoords match the checker size, centered for precision
    # (Utils.cpp: uv_scale = floor_size / (2 * checker_size)).
    uv_scale = floor_size / (2.0 * checker_size)
    mesh = mesh._replace(
        texcoords=(np.asarray(mesh.texcoords) - 0.5) * uv_scale)
    material = dict(tint=tint, roughness=roughness, flags=FLAG_THIN_WALLED)
    return mesh, material, texture


@host_build
def create_opacity_scene(aspect=1.0):
    """Opacity.h: checkered floor, a 0.1-radius sphere light inside a
    17x17-grid CUTOUT box ("Swizz box"), and two thin-walled
    coverage-0.75 planes in front (Opacity.h:27-107)."""
    from bifrost3d_tpu.io.texture import FILTER_NONE, TextureBank

    floor_mesh, floor_mat, floor_tex = _checkered_floor_parts()

    # 17x17 Alpha8 grid: opaque lines, holes in the cell centers
    # (Opacity.h:57-68); sampled with nearest filtering.
    grid = np.zeros((17, 17, 1), F32)
    for y in range(17):
        for x in range(17):
            grid[y, x, 0] = 1.0 if ((x & 1) == 0 or (y & 1) == 0) else 0.0

    textures = TextureBank.build([
        floor_tex,
        {"image": grid, "filter": FILTER_NONE}])

    floor_mat["tint_roughness_texture"] = 0
    mats = MaterialArray.build([
        floor_mat,
        dict(tint=(0.005, 0.01, 0.25), roughness=0.05, coverage=1.0,
             flags=FLAG_CUTOUT, coverage_texture=1),
        dict(tint=(0.25, 0.25, 0.25), roughness=0.95, coverage=0.75,
             flags=FLAG_THIN_WALLED)])

    plane = make_plane(size=1.0)
    instances = [
        (floor_mesh, 0, _trs((0, -0.0005, 0))),
        (make_box(size=1.0), 1, _trs((0, 0.5, 0))),
        (plane, 2, _trs((1.0, 1.0, -2.0), (1, 0, 0), HALF_PI, 2.0)),
        (plane, 2, _trs((0.0, 0.25, -3.0), (1, 0, 0), HALF_PI, 1.0))]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0, 0.5, 0), "radius": 0.1,
         "power": (50.0, 50.0, 50.0)}])
    scene = build_render_scene(instances, mats, lights, textures=textures)
    camera = perspective_camera(eye=(0, 1.0, -6.0), target=(0, 1.0, 0),
                                fov_radians=PI / 4, aspect=aspect)
    return scene, camera


@host_build
def create_test_scene(aspect=1.0):
    """TestScene.h analogue: a mixed-material still life."""
    mats = MaterialArray.build([
        dielectric((0.6, 0.6, 0.6), 0.9),
        metal(GOLD_TINT, 0.3),
        dielectric((0.2, 0.4, 0.8), 0.1, coat=1.0, coat_roughness=0.0),
        transmissive((0.95, 0.95, 0.95), 0.05)])
    instances = [
        (make_plane(size=20.0), 0, _trs((0, -0.5, 0))),
        (make_sphere(radius=0.4), 1, _trs((-1.0, -0.1, 0.3))),
        (make_box(size=0.7), 2, _trs((0.1, -0.15, 0.5), (0, 1, 0), 0.5)),
        (make_sphere(radius=0.4), 3, _trs((1.1, -0.1, -0.2)))]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (2, 4.0, -3.0), "radius": 0.4,
         "power": (200.0, 200.0, 200.0)}])
    env = np.full((16, 32, 3), 0.25, F32)
    scene = build_render_scene(instances, mats, lights, environment_map=env,
                               presample_environment=8192)
    camera = perspective_camera(eye=(0, 0.8, -3.0), target=(0, -0.1, 0),
                                fov_radians=PI / 4, aspect=aspect)
    return scene, camera


SCENES = {
    "CornellBox": create_cornell_box,
    "MaterialScene": create_material_scene,
    "MaterialSceneLegacy": create_legacy_material_scene,
    "Veach": create_veach_scene,
    "Sphere": create_sphere_scene,
    "SphereLight": create_sphere_light_scene,
    "Glass": create_glass_scene,
    "Opacity": create_opacity_scene,
    "Test": create_test_scene,
}
