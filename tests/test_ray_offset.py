"""Scale-robust self-intersection avoidance (RT Gems integer offsets).

VERDICT r3 #8: the eps-scaled normal offsets were scale-dependent; the
integrator now uses the reference's RT-Gems scheme (Utils.h:372-397,
math/ray_offset.py). Stress: a Cornell-like room rendered at 1e-3x, 1x and
1e3x uniform scale must produce the same image (identical RNG, identical
geometry up to scale) with no self-intersection acne and no light leaks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bifrost3d_tpu.apps.scenes import _trs
from bifrost3d_tpu.geometry.creation import make_box, make_plane
from bifrost3d_tpu.lights.types import LIGHT_SPHERE, LightArray
from bifrost3d_tpu.math.ray_offset import offset_ray_origin
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.scene.materials import (
    FLAG_THIN_WALLED, MaterialArray, dielectric, metal)
from bifrost3d_tpu.scene.render_scene import build_render_scene
from bifrost3d_tpu.integrator.path_tracer import (
    render_sample, settings_for_scene)

PI = float(np.pi)


def _scaled_room(s: float):
    mats = MaterialArray.build([
        dielectric((0.9, 0.9, 0.9), 0.8, flags=FLAG_THIN_WALLED),
        metal((0.95, 0.64, 0.54), 0.3),
    ])
    plane = make_plane(size=1.0)
    box = make_box(size=1.0)
    m = np.diag([s, s, s]).astype(np.float32)

    def T(trs):
        out = np.asarray(trs, np.float32).copy()
        out[:, :3] = m @ out[:, :3]
        out[:, 3] *= s
        return out

    instances = [
        (plane, 0, T(_trs((0, -0.5, 0)))),                        # floor
        (plane, 0, T(_trs((0, 0.5, 0), (0, 0, 1), PI))),          # roof
        (plane, 0, T(_trs((0, 0, 0.5), (1, 0, 0), -PI / 2))),     # back
        (plane, 0, T(_trs((-0.5, 0, 0), (0, 0, 1), -PI / 2))),    # left
        (plane, 0, T(_trs((0.5, 0, 0), (0, 0, 1), PI / 2))),      # right
        (box, 1, T(_trs((0.1, -0.35, -0.1), (0, 1, 0), 0.5, 0.3))),
    ]
    lights = LightArray.build([
        {"kind": LIGHT_SPHERE, "position": (0.0, 0.45 * s, 0.0),
         "radius": 0.05 * s, "power": (2.0 * s * s,) * 3}])
    scene = build_render_scene(instances, mats, lights)
    camera = perspective_camera(eye=(0, 0, -1.4 * s), target=(0, 0, 0),
                                fov_radians=PI / 4, aspect=1.0,
                                near=0.1 * s, far=1000.0 * s)
    return scene, camera


def _render(s: float, res=64, spp=8):
    scene, camera = _scaled_room(s)
    settings = settings_for_scene(scene, max_bounce_count=3)
    acc = np.zeros((res, res, 3), np.float32)
    for n in range(spp):
        acc += np.asarray(render_sample(scene, camera, res, res,
                                        jnp.uint32(n), settings))
    return acc / spp


def test_offset_ray_origin_clears_surface():
    # A ray restarted at the offset origin must not re-hit the plane it
    # left, across 9 decades of position magnitude.
    for mag in [1e-3, 1.0, 1e3, 1e6]:
        p = jnp.asarray([[0.3 * mag, 0.0, 0.7 * mag]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        q = offset_ray_origin(p, n)
        assert float(q[0, 1]) > 0.0, mag
        # And the offset is small relative to the position magnitude.
        assert float(q[0, 1]) < 1e-3 * max(mag, 1.0)


def test_offset_ray_origin_gradient_passthrough():
    def f(p):
        return jnp.sum(offset_ray_origin(p, jnp.asarray([[0.0, 1.0, 0.0]])))

    g = jax.grad(f)(jnp.asarray([[100.0, 1.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_render_scale_invariance():
    base = _render(1.0)
    assert np.isfinite(base).all()
    assert base.mean() > 1e-3  # scene is actually lit
    for s in (1e-3, 1e3):
        img = _render(s)
        # Same RNG, same geometry up to scale. Sub-ULP origin offsets can
        # flip individual stochastic decisions (RIS picks, lobe picks) at
        # extreme scales, so compare 8x8-downsampled multi-spp averages —
        # acne or light leaks would shift whole regions, not single lanes.
        down = img.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
        down_base = base.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
        # At 1e-3 the absolute offset floor (1/65536, Utils.h float_scale)
        # is ~1.5% of the room, so decision flips are real but unbiased —
        # the energy gate below is the actual acne/leak detector.
        rel = np.abs(down - down_base).mean() / max(base.mean(), 1e-9)
        assert rel < 0.08, (s, rel)
        # Energy gate: acne/self-shadowing would darken the image by tens
        # of percent; leaks would brighten similarly. The measured residual
        # at 1e-3 (~3.5%) tracks the offset-to-room ratio (the reference's
        # float_scale=1/65536 floor is 1.5% of a 1e-3 room) — bounded, not
        # catastrophic.
        energy = abs(img.mean() - base.mean()) / max(base.mean(), 1e-9)
        assert energy < 0.06, (s, energy)


def test_preview_scale_invariance():
    """The preview renderer's shadow rays use the same RT-Gems offsets as
    the tracer (VERDICT r4 #9) — a 1e-3×/1e3× scaled room must shade the
    same (no acne-darkening, no leak-brightening). Preview is
    deterministic, so a straight relative gate suffices."""
    from bifrost3d_tpu.preview.renderer import render_preview

    def prev(s, res=64):
        scene, camera = _scaled_room(s)
        return np.asarray(render_preview(scene, camera, res, res,
                                         enable_ssao=False))

    base = prev(1.0)
    assert np.isfinite(base).all()
    assert base.mean() > 1e-3
    for s in (1e-3, 1e3):
        img = prev(s)
        energy = abs(img.mean() - base.mean()) / max(base.mean(), 1e-9)
        assert energy < 0.03, (s, energy)
