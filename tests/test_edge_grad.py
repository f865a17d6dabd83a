"""Edge-sampled geometry gradients (diff/edge_grad.py) vs finite
differences.

Position gradients of visibility-driven images are ALL boundary term
(radiance is piecewise constant across a silhouette), so these are the
FD-matching geometry-gradient tests SURVEY §7.2 step 7 calls for. FD of
the deterministic stratified forward (``direct_emission_image``) is
quantized by the sub-pixel grid — tolerances reflect that, and the
dominant axis is checked tightly.
"""

import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.diff.edge_grad import (
    direct_emission_image,
    edge_position_gradient,
    smallpt_position_gradient,
)
from bifrost3d_tpu.scene import smallpt_scene
from bifrost3d_tpu.scene.spheres import SphereScene

W, H = 64, 48


def _one_sphere(center):
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return SphereScene(
        position=jnp.asarray([center], jnp.float32),
        radius=jnp.asarray([16.5], jnp.float32),
        emission=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
        color=z(1, 3), bsdf=jnp.zeros(1, jnp.int32),
        medium_sigma_t=z(1), medium_albedo=z(1), medium_g=z(1))


def test_single_sphere_edge_gradient_matches_fd():
    base = np.asarray([27.0, 16.5, 47.0], np.float32)
    g = np.asarray(edge_position_gradient(
        _one_sphere(base), 0, W, H, n_samples=2048))

    def fwd(c):
        return float(direct_emission_image(_one_sphere(c), W, H,
                                           samples_per_pixel=16))

    for axis, rtol, atol in ((0, 0.2, 3e-6), (2, 0.05, 0.0)):
        e = np.zeros(3, np.float32)
        e[axis] = 1.0
        fd = (fwd(base + e) - fwd(base - e)) / 2.0
        np.testing.assert_allclose(g[axis], fd, rtol=rtol, atol=atol)

    # Measured 2026-08-19: axis 2 edge 3.207e-4 vs fd 3.19e-4.
    assert g[2] > 1e-4, g


def test_smallpt_mirror_position_gradient_matches_fd():
    """Full 9-sphere SmallPT scene: moving the (emissive-for-this-test)
    mirror sphere. Occluded silhouette arcs cancel automatically because
    both edge probes then hit the occluder."""
    scene = smallpt_scene()
    scene = scene._replace(
        emission=scene.emission.at[6].set(jnp.asarray([2.0, 1.0, 0.5])))

    def fwd(s):
        return direct_emission_image(s, W, H, samples_per_pixel=16)

    g = np.asarray(smallpt_position_gradient(
        scene, 6, W, H, fwd, n_samples=2048))

    def f(axis, dx):
        return float(fwd(scene._replace(
            position=scene.position.at[6, axis].add(dx))))

    # Dominant axis (toward/away from camera): tight.
    fd_z = (f(2, 0.5) - f(2, -0.5)) / 1.0
    np.testing.assert_allclose(g[2], fd_z, rtol=0.05)
    # x-axis: small magnitude, FD grid quantization dominates.
    fd_x = (f(0, 0.5) - f(0, -0.5)) / 1.0
    np.testing.assert_allclose(g[0], fd_x, rtol=0.5, atol=3e-6)
