"""Standalone dev analysis tools — counterparts of the reference's
``apps/dev/{MonteCarloSeeding, NormalRepresentations,
SubsurfaceScatteringTestBed}`` (SURVEY.md §2.7).

Three comparative analyses, vectorized over JAX instead of the reference's
scalar loops, each printing a compact table:

- ``seeding``   — Monte-Carlo seeding strategies (MonteCarloSeeding
  main.cpp:218-254): per-pixel estimator error and neighbor decorrelation
  for jenkins-hash / uniform / morton / sobol-encoded seeds driving an LCG.
- ``normals``   — unit-vector encodings (NormalRepresentations
  main.cpp:187-199): mean/max angular error over random directions.
- ``sss``       — Burley normalized-diffusion sampling
  (SubsurfaceScatteringTestBed): exact-CDF and approximate samplers vs the
  analytic profile (mean radius, integral, tail mass).

Run: ``python -m bifrost3d_tpu.apps.dev_analysis [seeding|normals|sss|all]``
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.math.morton import morton_encode_2d
from bifrost3d_tpu.sampling.hashes import (
    jenkins_hash,
    lcg_next,
    reverse_bits,
)


# ---------------------------------------------------------------------------
# Monte-Carlo seeding (MonteCarloSeeding/main.cpp)
# ---------------------------------------------------------------------------

def _seed_strategies(width):
    def jenkins(x, y, s):
        return jenkins_hash(x + y * width) + reverse_bits(s)

    def uniform(x, y, s):
        return jnp.broadcast_to(reverse_bits(s), x.shape)

    def morton(x, y, s):
        e = reverse_bits(morton_encode_2d(x, y))
        return (e ^ (e >> 16)) ^ (jnp.uint32(1013904223) * s)

    def sobol_enc(x, y, s):
        # Integer sobol2 (RNG.h sobol2): the float API would drop the low
        # mantissa bits the morton interleave depends on.
        scramble = jnp.zeros_like(x)
        v = jnp.uint32(1 << 31)
        for bit in range(32):
            use = ((x >> jnp.uint32(bit)) & jnp.uint32(1)).astype(jnp.uint32)
            scramble = scramble ^ (use * v)
            v = v ^ (v >> jnp.uint32(1))
        e = reverse_bits(morton_encode_2d(scramble, y))
        return (e ^ (e >> 16)) + reverse_bits(s)

    return {"jenkins": jenkins, "uniform": uniform, "morton": morton,
            "sobol-encoded": sobol_enc}


def seeding_analysis(width=128, height=128, sample_count=5):
    """Estimate ∫₀¹ u du = 0.5 per pixel with ``sample_count`` LCG draws
    seeded per strategy; report the error's std-dev (estimator quality) and
    the horizontal neighbor correlation of the error image (negative =
    blue-noise-like, good for dithering; ~0 = white noise)."""
    x = jnp.broadcast_to(jnp.arange(width, dtype=jnp.uint32)[None, :],
                         (height, width))
    y = jnp.broadcast_to(jnp.arange(height, dtype=jnp.uint32)[:, None],
                         (height, width))
    rows = []
    for name, seeder in _seed_strategies(width).items():
        acc = jnp.zeros((height, width), jnp.float32)
        for s in range(sample_count):
            state = seeder(x, y, jnp.uint32(s))
            state, u = lcg_next(state)
            acc = acc + u
        err = np.asarray(acc / sample_count - 0.5)
        a = err[:, :-1].reshape(-1)
        b = err[:, 1:].reshape(-1)
        corr = float(np.corrcoef(a, b)[0, 1])
        rows.append((name, float(err.std()), corr))
    print(f"seeding (∫u du estimator, {sample_count} spp, "
          f"{width}x{height}):")
    print(f"  {'strategy':15s} {'error std':>10s} {'neighbor corr':>14s}")
    for name, std, corr in rows:
        print(f"  {name:15s} {std:10.4f} {corr:14.4f}")
    return {name: dict(error_std=std, neighbor_corr=corr)
            for name, std, corr in rows}


# ---------------------------------------------------------------------------
# Unit-vector encodings (NormalRepresentations/main.cpp)
# ---------------------------------------------------------------------------

def _random_directions(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def normals_analysis(n=200_000):
    """Mean/max angular error (degrees) of unit-vector encodings."""
    from bifrost3d_tpu.math.octahedral import (
        octahedral_decode, octahedral_encode)

    dirs = jnp.asarray(_random_directions(n))

    def angular_error(decoded):
        d = jnp.clip(jnp.sum(dirs * decoded, axis=-1), -1.0, 1.0)
        return np.degrees(np.asarray(jnp.arccos(d)))

    def renorm(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    encodings = {
        "oct32 (2x int16)": lambda: octahedral_decode(
            octahedral_encode(dirs)),
        "half3": lambda: renorm(dirs.astype(jnp.float16
                                            ).astype(jnp.float32)),
        "reconstruct-z64": lambda: jnp.concatenate([
            dirs[:, :2],
            jnp.sign(dirs[:, 2:3]) * jnp.sqrt(jnp.maximum(
                1.0 - jnp.sum(dirs[:, :2] ** 2, -1, keepdims=True), 0.0))],
            axis=-1),
        "xyz24 (3x unorm8)": lambda: renorm(
            (jnp.round((dirs * 0.5 + 0.5) * 255.0) / 255.0 - 0.5) * 2.0),
    }
    print(f"unit-vector encodings ({n} random directions):")
    print(f"  {'encoding':20s} {'mean err°':>10s} {'max err°':>10s}")
    out = {}
    for name, fn in encodings.items():
        err = angular_error(fn())
        print(f"  {name:20s} {err.mean():10.5f} {err.max():10.5f}")
        out[name] = dict(mean_deg=float(err.mean()), max_deg=float(err.max()))
    return out


# ---------------------------------------------------------------------------
# Burley SSS sampling testbed (SubsurfaceScatteringTestBed)
# ---------------------------------------------------------------------------

def sss_analysis(n=1 << 18, dmfp=1.0):
    """Exact-CDF vs approximate Burley diffusion sampling: distribution
    moments against the analytic profile r·R(r) (mean radius 11d/8 for the
    two-exponential Burley profile with s-scaled d)."""
    from bifrost3d_tpu.bsdf.burley_sss import (
        evaluate_profile,
        sample_diffusion_profile,
        sample_diffusion_profile_approximation,
    )

    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    out = {}
    print(f"burley SSS sampling (dmfp {dmfp}, {n} stratified samples):")
    print(f"  {'sampler':14s} {'mean r':>9s} {'p95 r':>9s} "
          f"{'pdf·r integ':>12s}")
    for name, fn in (("exact-cdf", sample_diffusion_profile),
                     ("approx-c2.6",
                      sample_diffusion_profile_approximation)):
        res = fn(u, jnp.float32(dmfp))
        r = np.asarray(res[0] if isinstance(res, tuple) else res)
        # The polar-profile normalization: ∫ 2πr·R(r) dr should be 1.
        grid = jnp.linspace(1e-4, 30.0 * dmfp, 8192)
        prof = np.asarray(evaluate_profile(grid, jnp.float32(dmfp)))
        integ = float(np.trapezoid(2.0 * np.pi * np.asarray(grid) * prof,
                                   np.asarray(grid)))
        print(f"  {name:14s} {r.mean():9.4f} {np.percentile(r, 95):9.4f} "
              f"{integ:12.5f}")
        out[name] = dict(mean_r=float(r.mean()),
                         p95_r=float(np.percentile(r, 95)),
                         profile_integral=integ)
    return out


def main(argv=None):
    which = (argv or sys.argv[1:] or ["all"])[0]
    if which in ("seeding", "all"):
        seeding_analysis()
    if which in ("normals", "all"):
        normals_analysis()
    if which in ("sss", "all"):
        sss_analysis()


if __name__ == "__main__":
    main()
