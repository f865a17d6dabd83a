"""Math-layer tests — counterpart of the reference's BifrostTests math suite
(SURVEY.md §4: Distribution1D PDF↔CDF consistency, color round-trips,
transform/quaternion algebra, octahedral encode/decode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.math import (
    Distribution1D,
    Distribution2D,
    Transform,
    cross,
    dot,
    hsv_to_rgb,
    linear_to_srgb,
    normalize,
    octahedral_decode,
    octahedral_encode,
    quat_from_axis_angle,
    quat_look_in,
    quat_mul,
    quat_rotate,
    quat_to_matrix,
    reflect,
    refract,
    rgb_to_hsv,
    srgb_to_linear,
    to_local,
    to_world,
    transform_compose,
    transform_inverse,
    transform_look_at,
    transform_point,
    orthonormal_basis,
)
from bifrost3d_tpu.math.morton import morton_decode_2d, morton_encode_2d


def rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestVec:
    def test_normalize_unit_and_zero_safe(self):
        v = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
        n = normalize(v)
        np.testing.assert_allclose(n[0], [0.6, 0.8, 0.0], atol=1e-6)
        assert np.all(np.isfinite(np.asarray(n[1])))

    def test_reflect_preserves_length_and_flips(self):
        d = jnp.asarray(rand_dirs(64))
        n = jnp.asarray(rand_dirs(64, seed=1))
        r = reflect(d, n)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r), axis=-1), 1.0, atol=1e-5)
        # Angle of incidence == angle of reflection.
        np.testing.assert_allclose(
            np.asarray(dot(d, n)), -np.asarray(dot(r, n)), atol=1e-5)

    def test_refract_snells_law(self):
        # Straight-on refraction is unchanged; 45 degrees follows Snell.
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        d = normalize(jnp.asarray([[1.0, 0.0, -1.0]]))
        eta = 1.0 / 1.5
        t, tir = refract(d, n, eta)
        assert not bool(tir[0])
        sin_in = np.sqrt(0.5)
        sin_out = np.linalg.norm(np.asarray(t)[0, :2])
        np.testing.assert_allclose(sin_out, eta * sin_in, atol=1e-6)

    def test_refract_total_internal_reflection(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        d = normalize(jnp.asarray([[1.0, 0.0, -0.1]]))
        t, tir = refract(d, n, 1.5)
        assert bool(tir[0])
        np.testing.assert_allclose(np.asarray(t), np.asarray(reflect(d, n)), atol=1e-6)

    def test_orthonormal_basis(self):
        n = jnp.asarray(rand_dirs(256))
        t, b = orthonormal_basis(n)
        for v in (t, b):
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(b, n)), 0.0, atol=1e-5)
        # Right-handed: t x b == n.
        np.testing.assert_allclose(np.asarray(cross(t, b)), np.asarray(n), atol=1e-4)

    def test_to_local_world_roundtrip(self):
        n = jnp.asarray(rand_dirs(128))
        v = jnp.asarray(rand_dirs(128, seed=2))
        np.testing.assert_allclose(
            np.asarray(to_world(to_local(v, n), n)), np.asarray(v), atol=1e-5)
        # Normal maps to +z.
        np.testing.assert_allclose(
            np.asarray(to_local(n, n)), np.tile([0, 0, 1.0], (128, 1)), atol=1e-5)


class TestColor:
    def test_srgb_roundtrip(self):
        c = jnp.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(
            np.asarray(srgb_to_linear(linear_to_srgb(c))), np.asarray(c), atol=1e-5)

    def test_hsv_roundtrip(self):
        rng = np.random.default_rng(3)
        rgb = jnp.asarray(rng.random((128, 3)), jnp.float32)
        back = hsv_to_rgb(rgb_to_hsv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


class TestQuaternion:
    def test_rotate_matches_matrix(self):
        q = quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), 0.7)
        v = jnp.asarray(rand_dirs(32))
        m = quat_to_matrix(q)
        np.testing.assert_allclose(
            np.asarray(quat_rotate(q, v)),
            np.asarray(v) @ np.asarray(m).T, atol=1e-5)

    def test_mul_composition(self):
        qa = quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), 0.5)
        qb = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), -1.1)
        v = jnp.asarray(rand_dirs(16))
        np.testing.assert_allclose(
            np.asarray(quat_rotate(quat_mul(qa, qb), v)),
            np.asarray(quat_rotate(qa, quat_rotate(qb, v))), atol=1e-5)

    def test_look_in_forward(self):
        d = normalize(jnp.asarray([1.0, 2.0, 3.0]))
        q = quat_look_in(d)
        fwd = quat_rotate(q, jnp.asarray([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(d), atol=1e-5)

    def test_look_in_backward_regression(self):
        """Rotations > 90° broke the old sqrt+copysign matrix→quat path
        (camera facing -z got a flipped y axis)."""
        for target in ([0.0, -1.0, -3.0], [0.0, 0.0, -1.0], [-2.0, 0.5, -1.0]):
            d = normalize(jnp.asarray(target))
            q = quat_look_in(d)
            fwd = quat_rotate(q, jnp.asarray([0.0, 0.0, 1.0]))
            np.testing.assert_allclose(np.asarray(fwd), np.asarray(d), atol=1e-5)
            up = quat_rotate(q, jnp.asarray([0.0, 1.0, 0.0]))
            assert float(up[1]) > 0.0  # up stays up

    def test_matrix_quat_roundtrip(self):
        from bifrost3d_tpu.math.quaternion import quat_from_matrix
        rng = np.random.default_rng(9)
        axes = rng.normal(size=(64, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        q = quat_from_axis_angle(jnp.asarray(axes, jnp.float32),
                                 jnp.asarray(rng.uniform(0, np.pi, 64), jnp.float32))
        q2 = quat_from_matrix(quat_to_matrix(q))
        dots = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
        assert dots.min() > 1.0 - 1e-5


class TestTransform:
    def test_inverse_roundtrip(self):
        t = Transform(
            translation=jnp.asarray([1.0, -2.0, 3.0]),
            rotation=quat_from_axis_angle(normalize(jnp.asarray([1.0, 1.0, 0.0])), 0.9),
            scale=jnp.asarray(2.5))
        p = jnp.asarray(rand_dirs(16)) * 5.0
        back = transform_point(transform_inverse(t), transform_point(t, p))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)

    def test_compose_is_apply_inner_then_outer(self):
        a = transform_look_at(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 1.0, 4.0]))
        b = Transform(jnp.asarray([0.5, 0.0, 0.0]),
                      quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), 0.3),
                      jnp.asarray(1.5))
        p = jnp.asarray(rand_dirs(8))
        np.testing.assert_allclose(
            np.asarray(transform_point(transform_compose(a, b), p)),
            np.asarray(transform_point(a, transform_point(b, p))), atol=1e-5)


class TestDistribution1D:
    def test_cdf_pdf_consistency(self):
        f = jnp.asarray([1.0, 5.0, 0.0, 3.0, 1.0, 0.5, 2.0, 8.0])
        d = Distribution1D.build(f)
        # CDF ends at one, integral is the mean.
        np.testing.assert_allclose(float(d.cdf[-1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(d.integral), float(jnp.mean(f)), atol=1e-6)
        # evaluate() reconstructs the function (reference Distribution1DTest).
        xs = (jnp.arange(8) + 0.5) / 8.0
        np.testing.assert_allclose(np.asarray(d.evaluate(xs)), np.asarray(f), atol=1e-5)

    def test_sampling_matches_pdf(self):
        f = jnp.asarray([1.0, 5.0, 0.0, 3.0])
        d = Distribution1D.build(f)
        u = jnp.asarray(np.random.default_rng(4).random(8192), jnp.float32)
        xs, pdfs = d.sample_continuous(u)
        assert np.all(np.asarray(pdfs) > 0)
        np.testing.assert_allclose(
            np.asarray(d.pdf_continuous(xs)), np.asarray(pdfs), rtol=1e-4)
        # Zero-probability bucket is never sampled.
        assert not np.any((np.asarray(xs) >= 0.5) & (np.asarray(xs) < 0.75))
        # Histogram ∝ function.
        hist, _ = np.histogram(np.asarray(xs), bins=4, range=(0, 1))
        np.testing.assert_allclose(hist / 8192.0, np.asarray(f) / 9.0, atol=0.02)


class TestDistribution2D:
    def test_sampling_matches_pdf_and_histogram(self):
        rng = np.random.default_rng(5)
        f = jnp.asarray(rng.random((8, 16)).astype(np.float32) ** 2)
        d = Distribution2D.build(f)
        u2 = jnp.asarray(rng.random((16384, 2)), jnp.float32)
        uv, pdf = d.sample_continuous(u2)
        np.testing.assert_allclose(
            np.asarray(d.pdf_continuous(uv)), np.asarray(pdf), rtol=1e-3)
        # MC estimate of the integral: E[f/pdf] == integral.
        est = np.mean(np.asarray(d.evaluate(uv)) / np.asarray(pdf))
        np.testing.assert_allclose(est, float(d.integral), rtol=0.02)

    def test_uniform_function(self):
        d = Distribution2D.build(jnp.ones((4, 4)))
        uv, pdf = d.sample_continuous(jnp.asarray([[0.3, 0.8]]))
        np.testing.assert_allclose(np.asarray(pdf), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(uv), [[0.3, 0.8]], atol=1e-5)


class TestOctahedral:
    def test_roundtrip_precision(self):
        n = rand_dirs(4096, seed=7)
        dec = np.asarray(octahedral_decode(octahedral_encode(jnp.asarray(n))))
        # int16 quantization keeps directions within ~1e-4 of the input
        # (reference uses encode_precise ULP search; plain rounding is close).
        dots = np.sum(dec * n, axis=-1)
        assert np.min(dots) > 1.0 - 1e-6

    def test_axes_exact(self):
        axes = np.eye(3, dtype=np.float32)
        axes = np.concatenate([axes, -axes])
        dec = np.asarray(octahedral_decode(octahedral_encode(jnp.asarray(axes))))
        np.testing.assert_allclose(dec, axes, atol=1e-4)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.integers(0, 1 << 16, 256), jnp.uint32)
        y = jnp.asarray(rng.integers(0, 1 << 16, 256), jnp.uint32)
        code = morton_encode_2d(x, y)
        dx, dy = morton_decode_2d(code)
        np.testing.assert_array_equal(np.asarray(dx), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(dy), np.asarray(y))


class TestGeometryPrimitives:
    """Plane/Line/Rect/Intersect/ImageSampling (Math/{Plane,Line,Rect,
    Intersect,ImageSampling}.h counterparts)."""

    def test_ray_plane(self):
        from bifrost3d_tpu.math.geometry2d3d import Plane, intersect_ray_plane
        plane = Plane.from_point_normal((0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
        t = intersect_ray_plane(jnp.asarray([0.0, 3.0, 0.0]),
                                jnp.asarray([0.0, -1.0, 0.0]), plane)
        np.testing.assert_allclose(float(t), 2.0, atol=1e-6)
        # Parallel ray: no positive hit.
        t = intersect_ray_plane(jnp.asarray([0.0, 3.0, 0.0]),
                                jnp.asarray([1.0, 0.0, 0.0]), plane)
        assert not (0.0 <= float(t) < 1e18)

    def test_ray_sphere(self):
        from bifrost3d_tpu.math.geometry2d3d import intersect_ray_sphere
        t = intersect_ray_sphere(jnp.asarray([0.0, 0.0, -3.0]),
                                 jnp.asarray([0.0, 0.0, 1.0]),
                                 (0.0, 0.0, 0.0), 1.0)
        np.testing.assert_allclose(float(t), 2.0, atol=1e-5)
        # From inside: far hit.
        t = intersect_ray_sphere(jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]),
                                 (0.0, 0.0, 0.0), 1.0)
        np.testing.assert_allclose(float(t), 1.0, atol=1e-5)
        # Miss → -1.
        t = intersect_ray_sphere(jnp.asarray([5.0, 5.0, -3.0]),
                                 jnp.asarray([0.0, 0.0, 1.0]),
                                 (0.0, 0.0, 0.0), 1.0)
        assert float(t) == -1.0

    def test_line_through_and_fit(self):
        from bifrost3d_tpu.math.geometry2d3d import Line
        line = Line.through((0.0, 1.0), (2.0, 5.0))
        np.testing.assert_allclose(float(line.slope), 2.0)
        np.testing.assert_allclose(float(line.evaluate(3.0)), 7.0)
        np.testing.assert_allclose(float(line.signed_distance(1.0, 4.0)), 1.0)
        # Least-squares fit recovers a noiseless line exactly.
        xs = jnp.linspace(0.0, 1.0, 16)
        fit = Line.fit(xs, 3.0 * xs - 0.5)
        np.testing.assert_allclose(float(fit.slope), 3.0, atol=1e-5)
        np.testing.assert_allclose(float(fit.intercept), -0.5, atol=1e-5)

    def test_bilinear_trilinear_sampling(self):
        from bifrost3d_tpu.math.geometry2d3d import (
            sample_bilinear, sample_trilinear)
        img = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4, 1))
        # Texel centers return exact values.
        v = sample_bilinear(img, (0.5 + 0.0) / 4.0, (0.5 + 0.0) / 2.0)
        np.testing.assert_allclose(np.asarray(v), [0.0], atol=1e-6)
        v = sample_bilinear(img, (0.5 + 2.0) / 4.0, (0.5 + 1.0) / 2.0)
        np.testing.assert_allclose(np.asarray(v), [6.0], atol=1e-6)
        # Midpoint between texels interpolates; batch works.
        v = sample_bilinear(img, jnp.asarray([1.0 / 4.0]), jnp.asarray([0.25]))
        np.testing.assert_allclose(np.asarray(v), [[0.5]], atol=1e-6)
        vol = jnp.asarray(np.arange(16, dtype=np.float32).reshape(2, 2, 4, 1))
        t = sample_trilinear(vol, 0.125, 0.25, 0.5)
        np.testing.assert_allclose(np.asarray(t), [4.0], atol=1e-6)

    def test_rect(self):
        from bifrost3d_tpu.math.geometry2d3d import Rect
        r = Rect(2, 3, 10, 20)
        assert r.offset == (2, 3) and r.size == (10, 20)
