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
