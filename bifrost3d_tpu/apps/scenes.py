"""Built-in test scenes.

Counterparts of the reference's SimpleViewer scenes
(``apps/SimpleViewer/Scenes/*``, SURVEY.md §2.7): CornellBox (faithful to
CornellBox.h:23-120 — 1-unit thin-walled room, iron + copper boxes, sphere
light), MaterialScene (the roughness × metallic sphere grid), Veach MIS
scene (plates of varying roughness under lights of varying size), plus
Sphere / SphereLight / Glass / Opacity / Test scenes.

Each builder returns (RenderScene, PinholeCamera).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.geometry import make_box, make_plane, make_sphere, transform_mesh
from bifrost3d_tpu.lights.types import LIGHT_DIRECTIONAL, LIGHT_SPHERE, LightArray
from bifrost3d_tpu.math.quaternion import quat_from_axis_angle, quat_to_matrix
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import (
    COPPER_TINT,
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


def create_cornell_box(environment_map=None):
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
                                fov_radians=PI / 4, aspect=1.0)
    return scene, camera


def create_material_scene(rows: int = 3, cols: int = 6, environment_map=None):
    """MaterialScene.h behavior: a grid of spheres sweeping roughness along
    x and metallic along y, on a grey floor under a directional light."""
    material_dicts = [dielectric((0.5, 0.5, 0.5), 0.9)]
    instances = [(make_plane(size=20.0), 0, _trs((0, -0.5, 0)))]
    sphere = make_sphere(radius=0.35, slices=32, stacks=16)
    for r in range(rows):
        for c in range(cols):
            metallic = r / max(rows - 1, 1)
            roughness = c / max(cols - 1, 1)
            material_dicts.append(dict(
                tint=GOLD_TINT, roughness=roughness, metallic=metallic,
                specularity=0.04))
            instances.append((
                sphere, len(material_dicts) - 1,
                _trs((c - (cols - 1) / 2, 0.0, r - (rows - 1) / 2))))
    mats = MaterialArray.build(material_dicts)
    lights = LightArray.build([
        {"kind": LIGHT_DIRECTIONAL, "direction": (-0.2, -1.0, 0.3),
         "radiance": (2.0, 2.0, 2.0)},
        {"kind": LIGHT_SPHERE, "position": (0, 6.0, -4.0), "radius": 1.0,
         "power": (400.0, 400.0, 400.0)}])
    env = environment_map if environment_map is not None else \
        np.full((16, 32, 3), 0.4, F32)
    scene = build_render_scene(instances, mats, lights, environment_map=env)
    camera = perspective_camera(
        eye=(0, 2.2, -5.5), target=(0, -0.2, 0), fov_radians=PI / 4,
        aspect=1.0)
    return scene, camera


def create_veach_scene(with_mesh_light: bool = False):
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
        aspect=1.0)
    return scene, camera


def create_sphere_scene():
    """Sphere.h: a single sphere on a plane under an environment."""
    mats = MaterialArray.build([
        dielectric((0.5, 0.5, 0.5), 0.8),
        dielectric((0.8, 0.2, 0.2), 0.3)])
    instances = [
        (make_plane(size=20.0), 0, _trs((0, -0.5, 0))),
        (make_sphere(radius=0.5), 1, _trs((0, 0, 0)))]
    env = np.full((16, 32, 3), 0.8, F32)
    scene = build_render_scene(instances, mats, environment_map=env)
    camera = perspective_camera(eye=(0, 0.5, -2.5), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=1.0)
    return scene, camera


def create_sphere_light_scene():
    """SphereLight.h: a diffuse sphere lit by a large nearby sphere light."""
    mats = MaterialArray.build([dielectric((0.8, 0.8, 0.8), 0.7)])
    instances = [(make_sphere(radius=0.5), 0, _trs((0, 0, 0)))]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (1.5, 1.0, -1.0), "radius": 0.5,
         "power": (40.0, 40.0, 40.0)}])
    scene = build_render_scene(instances, mats, lights)
    camera = perspective_camera(eye=(0, 0.5, -2.5), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=1.0)
    return scene, camera


def create_glass_scene():
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
    scene = build_render_scene(instances, mats, lights, environment_map=env)
    camera = perspective_camera(eye=(0, 0.6, -3.0), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=1.0)
    return scene, camera


def create_opacity_scene():
    """OpacityScene.h analogue: cutout and partial-coverage planes over a
    bright backdrop."""
    mats = MaterialArray.build([
        dielectric((0.7, 0.7, 0.7), 0.8),
        dict(tint=(0.9, 0.2, 0.2), roughness=0.6, coverage=0.5,
             flags=FLAG_THIN_WALLED),
        emissive((2.0, 2.0, 2.0))])
    quad_up = _trs((0, 0, 0.5), (1, 0, 0), -HALF_PI)
    instances = [
        (make_plane(size=10.0), 0, _trs((0, -0.5, 0))),
        (make_plane(size=1.0), 1, _trs((0, 0, 0), (1, 0, 0), -HALF_PI)),
        (make_plane(size=4.0), 2, quad_up)]
    scene = build_render_scene(instances, mats)
    camera = perspective_camera(eye=(0, 0.2, -2.0), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=1.0)
    return scene, camera


def create_test_scene():
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
    scene = build_render_scene(instances, mats, lights, environment_map=env)
    camera = perspective_camera(eye=(0, 0.8, -3.0), target=(0, -0.1, 0),
                                fov_radians=PI / 4, aspect=1.0)
    return scene, camera


SCENES = {
    "CornellBox": create_cornell_box,
    "MaterialScene": create_material_scene,
    "Veach": create_veach_scene,
    "Sphere": create_sphere_scene,
    "SphereLight": create_sphere_light_scene,
    "Glass": create_glass_scene,
    "Opacity": create_opacity_scene,
    "Test": create_test_scene,
}
