"""Precomputed rho lookup tables (energy-conservation fittings).

JAX re-implementation of ``apps/dev/MaterialPrecomputations`` (SURVEY.md
§2.7): Monte-Carlo integration of OUR BSDF implementations over a
(cos_theta × roughness) grid — the same closed loop as the reference, which
integrates its own BSDF headers so tables and BSDFs can never drift apart.

Tables (matching ``Assets/Shading/Fittings.h:16-76`` semantics):
- ``ggx``              [r=32, c=32]  GGX_R rho, specularity 1 ("full").
- ``ggx_with_fresnel`` [32, 32]      GGX_R rho, specularity 0 ("base").
- ``burley``           [32, 32]      Burley rho (roughness axis squared to
                                     alpha, as the reference's app does).
- ``dielectric_light/dense`` [16, 16, 16, 2] (ior, roughness, cos) ×
                                     (total, reflected) for combined GGX.
- ``bounded_vndf_alpha`` [32, 32]    (cos, encoded max pdf) → min alpha.

Grid convention: value at index i corresponds to coordinate i/(n-1)
(boundaries included); lookups are bilinear. Generated once and cached to
``data/fittings.npz`` (regenerate with ``python -m
bifrost3d_tpu.shading.fittings``).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from bifrost3d_tpu.bsdf import burley as burley_bsdf
from bifrost3d_tpu.bsdf import ggx
from bifrost3d_tpu.bsdf.fresnel import dielectric_specularity
from bifrost3d_tpu.sampling import pmj02_bn_samples
from bifrost3d_tpu.sampling.hashes import van_der_corput

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data", "fittings.npz")

ANGLE_SAMPLES = 32
ROUGHNESS_SAMPLES = 32
DIELECTRIC_SAMPLES = 16
MAX_PDF_SAMPLES = 32

# IOR grid ranges (PrecomputeDielectricBSDFRho.h:26-30): the dense range
# covers specularity 0.0125..0.25 traversed through air, offset slightly so
# ior 1.5 lands exactly on a grid plane.
_IOR_OFFSET = 0.01666667
MIN_DENSE_IOR = 1.25 + _IOR_OFFSET
MAX_DENSE_IOR = 3.0 + _IOR_OFFSET
MIN_LIGHT_IOR = 1.0 / MAX_DENSE_IOR
MAX_LIGHT_IOR = 1.0 / MIN_DENSE_IOR


class Fittings(NamedTuple):
    ggx: jnp.ndarray               # [roughness, cos]
    ggx_with_fresnel: jnp.ndarray  # [roughness, cos]
    burley: jnp.ndarray            # [roughness, cos]
    dielectric_light: jnp.ndarray  # [ior, roughness, cos, 2]
    dielectric_dense: jnp.ndarray  # [ior, roughness, cos, 2]
    bounded_vndf_alpha: jnp.ndarray  # [cos, encoded_pdf]


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------

def _grid_wo(n_angles):
    cos_theta = np.maximum(1e-6, np.arange(n_angles) / (n_angles - 1)).astype(np.float32)
    sin_theta = np.sqrt(np.maximum(1.0 - cos_theta**2, 0.0))
    return np.stack([sin_theta, np.zeros_like(cos_theta), cos_theta], -1), cos_theta


def _tabulate_brdf_rho(sample_fn, sample_count=4096):
    """rho[roughness, cos] via E[f·cosθ/pdf] with shared PMJ-BN samples.

    One fused dispatch over the whole (roughness × angle × sample) grid —
    4.2M lanes of pure VPU math.
    """
    u2 = _shared_u2(sample_count)
    wo_grid, _ = _grid_wo(ANGLE_SAMPLES)
    roughness = jnp.asarray(
        np.arange(ROUGHNESS_SAMPLES, dtype=np.float32) / (ROUGHNESS_SAMPLES - 1))
    # Broadcast: [r, a, s, ...]
    wo = jnp.broadcast_to(jnp.asarray(wo_grid)[None, :, None, :],
                          (ROUGHNESS_SAMPLES, ANGLE_SAMPLES, sample_count, 3))
    u = jnp.broadcast_to(u2[None, None, :, :],
                         (ROUGHNESS_SAMPLES, ANGLE_SAMPLES, sample_count, 2))
    r = jnp.broadcast_to(roughness[:, None, None],
                         (ROUGHNESS_SAMPLES, ANGLE_SAMPLES, sample_count))
    s = sample_fn(r, wo, u)
    pdf = np.asarray(s.pdf)
    contrib = np.where(
        pdf > 1e-9,
        np.asarray(s.reflectance[..., 0]) * np.abs(np.asarray(s.direction[..., 2]))
        / np.maximum(pdf, 1e-12), 0.0)
    return contrib.mean(axis=-1).astype(np.float32)


_U2_CACHE = {}


def _shared_u2(sample_count):
    if sample_count not in _U2_CACHE:
        _U2_CACHE[sample_count] = jnp.asarray(pmj02_bn_samples(sample_count))
    return _U2_CACHE[sample_count]


def _tabulate_dielectric(sample_count=4096):
    """(total, reflected) rho for combined GGX over the two IOR ranges."""
    n = DIELECTRIC_SAMPLES
    u2 = pmj02_bn_samples(sample_count)
    u3 = np.concatenate([
        u2, np.asarray(van_der_corput(
            jnp.arange(sample_count, dtype=jnp.uint32), jnp.uint32(0x9E3779B9)))[:, None]],
        axis=-1).astype(np.float32)
    wo_grid, _ = _grid_wo(n)
    import jax

    @jax.jit
    def one_slice(ior, spec, wo, u):
        """One (ior) slice: [roughness, angle, samples] fused."""
        roughness = jnp.arange(n, dtype=jnp.float32)[:, None, None] / (n - 1)
        alpha = ggx.alpha_from_roughness(roughness)
        s = ggx.sample(alpha, spec, ior, wo, u)
        w = jnp.where(s.pdf > 1e-9,
                      s.reflectance[..., 0] * jnp.abs(s.direction[..., 2])
                      / jnp.maximum(s.pdf, 1e-12), 0.0)
        is_refl = s.direction[..., 2] * wo[..., 2] > 0
        total = jnp.mean(w, axis=-1)
        refl = jnp.mean(jnp.where(is_refl, w, 0.0), axis=-1)
        return total, refl

    wo = jnp.broadcast_to(jnp.asarray(wo_grid)[None, :, None, :],
                          (n, n, sample_count, 3))
    u = jnp.broadcast_to(jnp.asarray(u3)[None, None, :, :], (n, n, sample_count, 3))

    out = {}
    for name, (ior_lo, ior_hi) in (("light", (MIN_LIGHT_IOR, MAX_LIGHT_IOR)),
                                   ("dense", (MIN_DENSE_IOR, MAX_DENSE_IOR))):
        table = np.zeros((n, n, n, 2), np.float32)
        for zi in range(n):
            ior = ior_lo + (ior_hi - ior_lo) * zi / (n - 1)
            # Normal-incidence reflectance is symmetric in the media pair.
            spec = float(dielectric_specularity(1.0, ior))
            total, refl = one_slice(jnp.float32(ior), jnp.float32(spec), wo, u)
            table[zi, :, :, 0] = np.asarray(total)
            table[zi, :, :, 1] = np.asarray(refl)
        out[name] = table
    return out["light"], out["dense"]


def encode_pdf(pdf):
    """Nonlinear PDF encoding (ShadingModels/Utils.h:104-130)."""
    non_linear = pdf / (1.0 + pdf)
    return jnp.minimum(1.0, (non_linear - 0.13) / 0.87)


def _decode_pdf(encoded):
    non_linear = encoded * 0.87 + 0.13
    return non_linear / (1.0 - non_linear)


def _tabulate_bounded_vndf_alpha():
    """alpha[cos, encoded_pdf]: smallest GGX alpha whose peak bounded-VNDF
    reflection PDF does not exceed the given max PDF (path regularization,
    apps/dev GGXAlphaFromMaxPDF.h)."""
    import jax

    wo_grid, _ = _grid_wo(ANGLE_SAMPLES)
    enc = jnp.arange(MAX_PDF_SAMPLES, dtype=jnp.float32) / (MAX_PDF_SAMPLES - 1)
    target = _decode_pdf(enc)[None, :]                       # [1, p]
    wo = jnp.asarray(wo_grid)[:, None, :]                    # [a, 1, 3]
    mirror = jnp.concatenate([-wo[..., :2], wo[..., 2:3]], axis=-1)
    shape = (ANGLE_SAMPLES, MAX_PDF_SAMPLES)

    @jax.jit
    def bisect():
        def body(_, state):
            lo, hi = state
            mid = 0.5 * (lo + hi)
            peak = ggx.r_pdf(mid, jnp.broadcast_to(wo, shape + (3,)),
                             jnp.broadcast_to(mirror, shape + (3,)))
            # Peak PDF decreases with alpha: too-high peak → raise alpha.
            too_sharp = peak > target
            return jnp.where(too_sharp, mid, lo), jnp.where(too_sharp, hi, mid)

        lo = jnp.full(shape, ggx.MIN_ALPHA, jnp.float32)
        hi = jnp.ones(shape, jnp.float32)
        lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
        return 0.5 * (lo + hi)

    return np.asarray(bisect())


def precompute_fittings(sample_count=4096, save_path=_DATA_PATH) -> Fittings:
    def sample_ggx_full(roughness, wo, u2):
        return ggx.r_sample(ggx.alpha_from_roughness(roughness), 1.0, wo, u2)

    def sample_ggx_base(roughness, wo, u2):
        return ggx.r_sample(ggx.alpha_from_roughness(roughness), 0.0, wo, u2)

    def sample_burley(roughness, wo, u2):
        # The reference's precompute passes GGX alpha as Burley roughness
        # (MaterialPrecomputations main.cpp:45-48) — replicate.
        alpha = ggx.alpha_from_roughness(roughness)
        return burley_bsdf.sample(jnp.ones(3), alpha, wo, u2)

    tables = {
        "ggx": _tabulate_brdf_rho(sample_ggx_full, sample_count),
        "ggx_with_fresnel": _tabulate_brdf_rho(sample_ggx_base, sample_count),
        "burley": _tabulate_brdf_rho(sample_burley, sample_count),
    }
    tables["dielectric_light"], tables["dielectric_dense"] = _tabulate_dielectric(
        sample_count)
    tables["bounded_vndf_alpha"] = _tabulate_bounded_vndf_alpha()

    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        np.savez_compressed(save_path, **tables)
    return Fittings(**{k: jnp.asarray(v) for k, v in tables.items()})


_CACHE = None


def get_fittings() -> Fittings:
    global _CACHE
    if _CACHE is None:
        if os.path.exists(_DATA_PATH):
            data = np.load(_DATA_PATH)
            # Cache as NUMPY arrays: get_fittings may first be called inside
            # a jit trace, where jnp.asarray would produce trace-local
            # tracers that must not leak into the module-level cache.
            _CACHE = Fittings(**{k: np.asarray(data[k]) for k in Fittings._fields})
        else:
            tables = precompute_fittings()
            _CACHE = Fittings(**{k: np.asarray(getattr(tables, k))
                                 for k in Fittings._fields})
    return _CACHE


# ---------------------------------------------------------------------------
# Lookups (bilinear, boundary-aligned like ImageSampling::bilinear)
# ---------------------------------------------------------------------------

def _hat_weights(coord, n):
    """Piecewise-linear interpolation weights [..., n] for coord in [0, 1].

    Each lane gets the two bilinear weights (1-t, t) scattered as a dense
    hat-function row: w_i = max(0, 1 - |coord*(n-1) - i|). Row-times-table
    then runs on the MXU instead of lowering to the 2D gathers XLA emits for
    `table[y0, x0]` — measured 2.2 ms/lookup at 65k lanes on TPU v5e for the
    gather form vs below measurement floor (~20 us) for this one; exact to
    2e-7 at Precision.HIGHEST (see BASELINE.md, one-hot rho fetches)."""
    f = jnp.clip(coord, 0.0, 1.0) * (n - 1)
    idx = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(f[..., None] - idx))


def _bilinear_2d(table, x, y):
    """table [ny, nx], coords in [0, 1] mapping to boundary-aligned grid.

    MXU formulation: result = w_y^T · T · w_x with hat-function weight rows,
    equivalent to the 4-tap gather bilinear but without TPU gathers."""
    table = jnp.asarray(table)  # cache holds numpy; lift per-trace
    wx = _hat_weights(x, table.shape[1])
    wy = _hat_weights(y, table.shape[0])
    return jnp.einsum('...y,yx,...x->...', wy, table, wx,
                      precision=jax.lax.Precision.HIGHEST)


def sample_ggx_rho(cos_theta, roughness, fittings: Fittings = None):
    f = fittings if fittings is not None else get_fittings()
    return _bilinear_2d(f.ggx, cos_theta, roughness)


def sample_ggx_with_fresnel_rho(cos_theta, roughness, fittings: Fittings = None):
    f = fittings if fittings is not None else get_fittings()
    return _bilinear_2d(f.ggx_with_fresnel, cos_theta, roughness)


def sample_burley_rho(cos_theta, roughness, fittings: Fittings = None):
    f = fittings if fittings is not None else get_fittings()
    return _bilinear_2d(f.burley, cos_theta, roughness)


def sample_dielectric_ggx_rho(cos_theta, roughness, ior_i_over_o,
                              fittings: Fittings = None):
    """→ (total_rho, reflected_rho), trilinear over the split IOR ranges."""
    f = fittings if fittings is not None else get_fittings()
    entering_dense = ior_i_over_o >= 1.0
    t_light = jnp.clip((ior_i_over_o - MIN_LIGHT_IOR)
                       / (MAX_LIGHT_IOR - MIN_LIGHT_IOR), 0.0, 1.0)
    t_dense = jnp.clip((ior_i_over_o - MIN_DENSE_IOR)
                       / (MAX_DENSE_IOR - MIN_DENSE_IOR), 0.0, 1.0)

    def trilinear(table, t_ior):
        n = table.shape[0]
        fz = t_ior * (n - 1)
        z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, n - 2)
        tz = fz - z0
        lo = _bilinear_2d_batch(table, z0, cos_theta, roughness)
        hi = _bilinear_2d_batch(table, z0 + 1, cos_theta, roughness)
        return lo * (1 - tz)[..., None] + hi * tz[..., None]

    light = trilinear(f.dielectric_light, t_light)
    dense = trilinear(f.dielectric_dense, t_dense)
    res = jnp.where(entering_dense[..., None] if jnp.ndim(entering_dense)
                    else entering_dense, dense, light)
    return res[..., 0], res[..., 1]


def _bilinear_2d_batch(table, z, x, y):
    """table [nz, ny, nx, c]; per-element z index. One-hot z row plus hat
    rows in x/y — the 4D-gather-free MXU form of the sliced bilinear."""
    table = jnp.asarray(table)  # cache holds numpy; lift per-trace
    nz = table.shape[0]
    wz = (z[..., None] == jnp.arange(nz, dtype=z.dtype)).astype(jnp.float32)
    wx = _hat_weights(x, table.shape[2])
    wy = _hat_weights(y, table.shape[1])
    return jnp.einsum('...z,zyxc,...y,...x->...c', wz, table, wy, wx,
                      precision=jax.lax.Precision.HIGHEST)


def estimate_ggx_alpha_from_max_pdf(cos_theta, max_pdf, fittings: Fittings = None):
    """Minimum GGX alpha for path regularization (GGXMinimumRoughness)."""
    f = fittings if fittings is not None else get_fittings()
    enc = encode_pdf(max_pdf)
    return _bilinear_2d(f.bounded_vndf_alpha, enc, cos_theta)


if __name__ == "__main__":
    import time
    t0 = time.time()
    precompute_fittings()
    print(f"fittings written to {_DATA_PATH} in {time.time() - t0:.1f}s")
