"""Compositor + renderer-registry tests (Compositor.cpp:203-327,
Core/Renderer.h:31-59 analogues): per-camera renderer selection, z-order,
screenshot request→fill→resolve, post chain, reset-on-change, and the full
engine-tick wiring."""

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.core.compositor import Compositor, Renderers
from bifrost3d_tpu.core.engine import Engine
from bifrost3d_tpu.integrator.backend import SimpleBackend
from bifrost3d_tpu.integrator.path_tracer import RenderSettings
from bifrost3d_tpu.geometry import make_sphere
from bifrost3d_tpu.math.transform import transform_identity
from bifrost3d_tpu.post.tonemap import CameraEffectsSettings
from bifrost3d_tpu.preview.renderer import PreviewBackend
from bifrost3d_tpu.scene.datamodel import SceneData


W = H = 24


def make_scene():
    d = SceneData()
    root = d.nodes.create("root")
    d.roots.create("scene", root, environment_tint=(0.2, 0.3, 0.4))
    mesh = d.meshes.create("sphere", make_sphere(radius=0.5))
    mat = d.materials.create("grey", tint=(0.5, 0.5, 0.5), roughness=0.6)
    node = d.nodes.create("obj")
    d.nodes.set_parent(node, root)
    d.models.create(node, mesh, mat)
    light_node = d.nodes.create("light", transform_identity()._replace(
        translation=jnp.asarray([0.0, 3.0, 0.0])))
    d.lights.create_sphere_light(light_node, (50, 50, 50), 0.3)
    cam_node = transform_identity()._replace(
        translation=jnp.asarray([0.0, 0.0, -2.5]))
    cam = d.cameras.create("main", root, transform=cam_node)
    return d, mat, cam


def make_compositor(d):
    comp = Compositor(d, width=W, height=H)
    pt_id = comp.add_renderer(
        "PathTracer",
        lambda scene, cam, w, h: SimpleBackend(
            scene, cam, w, h, RenderSettings(max_bounce_count=2)))
    pv_id = comp.add_renderer(
        "Preview",
        lambda scene, cam, w, h: PreviewBackend(scene, cam, w, h,
                                                enable_ssao=False))
    return comp, pt_id, pv_id


def test_registry_names_and_ids():
    r = Renderers()
    a = r.create("PathTracer")
    b = r.create("Preview")
    assert (a, b) == (0, 1)
    assert r.get_name(b) == "Preview"
    assert list(r) == [0, 1]


def test_render_selected_renderer_and_progressive_accumulation():
    d, mat, cam = make_scene()
    comp, pt_id, pv_id = make_compositor(d)
    d.cameras.set_renderer(cam, pt_id)
    d.reset_change_notifications()

    frames = comp.render()
    assert int(cam) in frames
    ldr = np.asarray(frames[int(cam)])
    assert ldr.shape == (H, W, 3)
    assert np.all(np.isfinite(ldr))
    backend = comp._backends[(int(cam), pt_id)]
    assert backend.accumulations == 1
    comp.render()
    assert backend.accumulations == 2

    # Switching the camera's renderer routes through the preview path.
    d.cameras.set_renderer(cam, pv_id)
    comp.render()
    assert isinstance(comp._backends[(int(cam), pv_id)], PreviewBackend)


def test_scene_change_resets_accumulation():
    d, mat, cam = make_scene()
    comp, pt_id, _ = make_compositor(d)
    d.cameras.set_renderer(cam, pt_id)
    d.reset_change_notifications()
    comp.render()
    comp.render()
    assert comp._backends[(int(cam), pt_id)].accumulations == 2
    d.materials.set_tint(mat, (0.9, 0.1, 0.1))
    comp.render()
    # Rebuilt backends → restarted accumulation (Renderer.cpp:1202-1204).
    assert comp._backends[(int(cam), pt_id)].accumulations == 1


def test_screenshot_pipeline_hdr_and_ldr():
    d, mat, cam = make_scene()
    comp, pt_id, _ = make_compositor(d)
    d.cameras.set_renderer(cam, pt_id)
    d.reset_change_notifications()

    d.cameras.request_screenshot(cam, content="hdr", minimum_iteration_count=2)
    comp.render()  # iteration 1: below the minimum → not filled
    assert d.cameras.is_screenshot_requested(cam)
    comp.render()  # iteration 2: filled
    shots = d.cameras.resolve_screenshot(cam)
    assert len(shots) == 1 and shots[0]["content"] == "hdr"
    assert shots[0]["iterations"] == 2
    hdr = np.asarray(shots[0]["image"])
    assert hdr.shape == (H, W, 3)

    d.cameras.request_screenshot(cam, content="ldr")
    comp.render()
    (shot,) = d.cameras.resolve_screenshot(cam)
    ldr = np.asarray(shot["image"])
    assert ldr.min() >= 0.0 and ldr.max() <= 1.0


def test_z_order_and_multiple_cameras():
    d, mat, cam = make_scene()
    comp, pt_id, pv_id = make_compositor(d)
    cam2 = d.cameras.create("pip", d.cameras._get(cam).scene_root,
                            transform=d.cameras.get_transform(cam),
                            z_index=-1)
    d.cameras.set_renderer(cam, pt_id)
    d.cameras.set_renderer(cam2, pv_id)
    ids = d.cameras.get_z_sorted_ids()
    assert ids[0] == cam2  # lower z renders first
    frames = comp.render()
    assert set(frames) == {int(cam), int(cam2)}


def test_engine_attach_full_tick():
    d, mat, cam = make_scene()
    comp, pt_id, _ = make_compositor(d)
    d.cameras.set_renderer(cam, pt_id)
    comp.set_camera_effects(cam, CameraEffectsSettings.linear())

    engine = Engine()
    engine.add_mutating_callback(lambda *_: None)
    comp.attach(engine)
    engine.do_tick(0.016)
    # Cleanup callback cleared the change notifications.
    assert not d.any_changes
    engine.do_tick(0.016)
    assert comp._backends[(int(cam), pt_id)].accumulations == 2


def test_datamodel_textures_flow_into_render():
    """Images/Textures managers -> SceneSync TextureBank -> integrator:
    a checkered tint texture must show up in the datamodel-driven render
    (Renderer.cpp:650-751 image/texture sync analogue)."""
    from bifrost3d_tpu.geometry import make_plane
    from bifrost3d_tpu.io.texture import FILTER_NONE
    from bifrost3d_tpu.math.transform import transform_identity

    d = SceneData()
    root = d.nodes.create("root")
    d.roots.create("scene", root, environment_tint=(0.6, 0.6, 0.6))

    # 2x2 red/blue checker in (tint.rgb, roughness) layout.
    checker = np.zeros((2, 2, 4), np.float32)
    checker[..., 3] = 0.8
    checker[0, 0, 0] = checker[1, 1, 0] = 1.0    # red cells
    checker[0, 1, 2] = checker[1, 0, 2] = 1.0    # blue cells
    img = d.images.create("checker", checker)
    tex = d.textures.create(img, magnification_filter=FILTER_NONE)

    mesh = d.meshes.create("floor", make_plane(size=2.0))
    mat = d.materials.create("floor", tint=(1.0, 1.0, 1.0), roughness=0.9,
                             tint_roughness_texture=tex)
    node = d.nodes.create("obj")
    d.nodes.set_parent(node, root)
    d.models.create(node, mesh, mat)
    light_node = d.nodes.create("light", transform_identity()._replace(
        translation=jnp.asarray([0.0, 3.0, 0.0])))
    d.lights.create_sphere_light(light_node, (60, 60, 60), 0.3)
    from bifrost3d_tpu.math.quaternion import quat_from_axis_angle
    cam = d.cameras.create(
        "main", root, transform=transform_identity()._replace(
            translation=jnp.asarray([0.0, 1.2, 0.0]),
            # +z-forward rotated to look straight down at the floor.
            rotation=quat_from_axis_angle(
                jnp.asarray([1.0, 0.0, 0.0]), np.pi / 2)))

    comp = Compositor(d, width=W, height=H)
    pt = comp.add_renderer(
        "PathTracer",
        lambda scene, camx, w, h: SimpleBackend(
            scene, camx, w, h, RenderSettings(max_bounce_count=1)))
    d.cameras.set_renderer(cam, pt)
    frames = comp.render()
    ldr = np.asarray(frames[int(cam)])
    assert np.isfinite(ldr).all()
    # Looking straight down at the checker: red and blue cells both visible.
    red = (ldr[..., 0] > ldr[..., 2] + 0.05).sum()
    blue = (ldr[..., 2] > ldr[..., 0] + 0.05).sum()
    assert red > 10 and blue > 10, (red, blue)
