"""GGX-reflection LTC fit table.

Counterpart of ``Assets/Shading/GGXLinearlyTransformedCosines.cpp`` (the
64×64 (cos θ × roughness) grid of isotropic LTC parameters) and the LTC
fitting pass of ``apps/dev/MaterialPrecomputations``. As with the rho
fittings, the table is produced by fitting against OUR GGX implementation
so table and BSDF can never drift apart.

TPU-first design: instead of the reference's serial per-cell Nelder-Mead,
a whole roughness row of 64 optimizations runs as ONE batched
Nelder-Mead — the simplex update is pure ``where``-selected arithmetic
under ``lax.fori_loop``, so the entire fit jits and vmaps. Rows march from
roughness 1 down to 0, warm-starting each row from the previous solution
(the classic LTC-fit continuation strategy, Heitz et al. 2016 §5).

Error metric: MIS-weighted L3 distance between the LTC density and the
normalized GGX D·G lobe, integrated with stratified samples drawn from
both distributions (the estimator used by Heitz's reference fitter).

Generated once and cached to ``data/ggx_ltc.npz``; regenerate with
``python -m bifrost3d_tpu.shading.ltc_fit``.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from bifrost3d_tpu.bsdf import ggx
from bifrost3d_tpu.math.ltc import IsotropicLTC
from bifrost3d_tpu.math import ltc as ltc_math

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data", "ggx_ltc.npz")

ANGLE_SAMPLES = 64
ROUGHNESS_SAMPLES = 64
_FIT_SAMPLES = 16 * 16      # stratified u2 points per sample set
_NM_ITERATIONS = 200
_MIN_FIT_ALPHA = 2e-4       # just above ggx.MIN_ALPHA: stay off the delta path
_MIN_FIT_COS = 0.02


def _stratified_u2(n_side: int):
    """n_side² stratified 2-d points with center offsets (deterministic)."""
    g = (jnp.arange(n_side, dtype=jnp.float32) + 0.5) / n_side
    gx, gy = jnp.meshgrid(g, g, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [K, 2]


def _params_to_ltc(p):
    """p[..., 4] = (log m00, log m11, m02, m20); m22 fixed to 1."""
    return IsotropicLTC(
        m00=jnp.exp(p[..., 0]), m11=jnp.exp(p[..., 1]),
        m22=jnp.ones_like(p[..., 0]), m02=p[..., 2], m20=p[..., 3])


def _make_row_objective(cos_grid, alpha, u2):
    """Objective for one roughness row: params [B, M, 4] → error [B, M].

    B = len(cos_grid) independent fits; M = candidate axis of the batched
    Nelder-Mead. Sample set A (from the GGX lobe) is parameter-independent
    and precomputed here; set B (from the LTC) is drawn per evaluation.
    """
    B = cos_grid.shape[0]
    K = u2.shape[0]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_grid * cos_grid, 0.0))
    wo = jnp.stack([sin_t, jnp.zeros_like(cos_grid), cos_grid], axis=-1)  # [B,3]

    # --- parameter-independent precompute -----------------------------
    wo_k = jnp.broadcast_to(wo[:, None, :], (B, K, 3))
    s = ggx.r_sample(jnp.full((B, K), alpha), 1.0, wo_k, u2[None, :, :])
    wi_a = s.direction                      # [B, K, 3]
    pdf_g_a = jnp.maximum(s.pdf, 0.0)       # [B, K]

    def d_ggx(wi, wo_b, rho):
        f = ggx.r_evaluate(alpha, 1.0, wo_b, wi)[..., 0]
        return f * jnp.maximum(wi[..., 2], 0.0) / rho

    # Normalization: rho = ∫ f·cos via the same GGX samples.
    f_a = ggx.r_evaluate(alpha, 1.0, wo_k, wi_a)[..., 0]
    contrib = jnp.where(pdf_g_a > 1e-12,
                        f_a * jnp.maximum(wi_a[..., 2], 0.0)
                        / jnp.maximum(pdf_g_a, 1e-12), 0.0)
    rho = jnp.maximum(jnp.mean(contrib, axis=-1), 1e-6)  # [B]

    d_g_a = d_ggx(wi_a, wo_k, rho[:, None])  # [B, K]

    def objective(p):  # p: [B, M, 4]
        l = _params_to_ltc(p)
        lk = IsotropicLTC(*(x[..., None] for x in l))  # add K axis

        # Set A: GGX-sampled directions.
        wi = wi_a[:, None, :, :]                      # [B, 1, K, 3]
        pdf_l_a = ltc_math.pdf(lk, wi)                # [B, M, K]
        err_a = jnp.abs(pdf_l_a - d_g_a[:, None, :]) ** 3 \
            / (pdf_g_a[:, None, :] + pdf_l_a + 1e-8)

        # Set B: LTC-sampled directions (depend on the parameters).
        wi_b, pdf_l_b = ltc_math.sample(lk, u2[None, None, :, :])  # [B,M,K,3]
        wo_b = wo[:, None, None, :]
        pdf_g_b = ggx.r_pdf(alpha, jnp.broadcast_to(wo_b, wi_b.shape), wi_b)
        d_g_b = d_ggx(wi_b, jnp.broadcast_to(wo_b, wi_b.shape), rho[:, None, None])
        err_b = jnp.abs(pdf_l_b - d_g_b) ** 3 / (pdf_g_b + pdf_l_b + 1e-8)

        return jnp.mean(err_a, axis=-1) + jnp.mean(err_b, axis=-1)

    return objective


def _batched_nelder_mead(f, x0, iterations: int, step: float = 0.05):
    """Minimize f: [B, M, n] → [B, M] independently per batch element.

    Pure where-selected simplex updates (reflect/expand/contract/shrink with
    the standard 1/2/0.5/0.5 coefficients, like ``Math/NelderMead.h``) under
    ``lax.fori_loop`` — jittable, no host control flow.
    """
    B, n = x0.shape
    simplex = jnp.concatenate(
        [x0[:, None, :], x0[:, None, :] + step * jnp.eye(n)[None]], axis=1)
    values = f(simplex)  # [B, n+1]

    def body(_, carry):
        simplex, values = carry
        order = jnp.argsort(values, axis=-1)
        values = jnp.take_along_axis(values, order, axis=-1)
        simplex = jnp.take_along_axis(simplex, order[..., None], axis=1)

        best_v, second_worst_v, worst_v = values[:, 0], values[:, -2], values[:, -1]
        worst = simplex[:, -1]
        centroid = jnp.mean(simplex[:, :-1], axis=1)

        reflected = 2.0 * centroid - worst
        expanded = 3.0 * centroid - 2.0 * worst
        contracted = 0.5 * (centroid + worst)
        cand = jnp.stack([reflected, expanded, contracted], axis=1)
        fr, fe, fc = [f(cand)[:, i] for i in range(3)]

        take_reflect = (best_v <= fr) & (fr < second_worst_v)
        expand_better = fe < fr
        take_expand = (fr < best_v) & expand_better
        take_reflect = take_reflect | ((fr < best_v) & ~expand_better)
        take_contract = ~(take_reflect | take_expand) & (fc < worst_v)
        shrink = ~(take_reflect | take_expand | take_contract)

        new_worst = jnp.where(take_expand[:, None], expanded,
                     jnp.where(take_reflect[:, None], reflected,
                      jnp.where(take_contract[:, None], contracted, worst)))
        new_worst_v = jnp.where(take_expand, fe,
                       jnp.where(take_reflect, fr,
                        jnp.where(take_contract, fc, worst_v)))
        moved_simplex = jnp.concatenate(
            [simplex[:, :-1], new_worst[:, None]], axis=1)
        moved_values = jnp.concatenate(
            [values[:, :-1], new_worst_v[:, None]], axis=-1)

        shrunk_simplex = simplex[:, :1] + 0.5 * (simplex - simplex[:, :1])
        shrunk_values = f(shrunk_simplex)

        simplex = jnp.where(shrink[:, None, None], shrunk_simplex, moved_simplex)
        values = jnp.where(shrink[:, None], shrunk_values, moved_values)
        return simplex, values

    simplex, values = jax.lax.fori_loop(0, iterations, body, (simplex, values))
    best = jnp.argmin(values, axis=-1)
    return jnp.take_along_axis(simplex, best[:, None, None], axis=1)[:, 0], \
        jnp.take_along_axis(values, best[:, None], axis=-1)[:, 0]


def precompute_ggx_ltc(save_path=_DATA_PATH,
                       angle_samples: int = ANGLE_SAMPLES,
                       roughness_samples: int = ROUGHNESS_SAMPLES):
    """Fit the full (cos θ × roughness) grid. Returns [R, C, 4] float32
    (m00, m11, m02, m20) with m22 ≡ 1; axis convention matches the rho
    fittings: value at index i sits at coordinate i/(n-1)."""
    cos_grid = jnp.maximum(
        jnp.arange(angle_samples, dtype=jnp.float32) / (angle_samples - 1),
        _MIN_FIT_COS)
    u2 = _stratified_u2(int(np.sqrt(_FIT_SAMPLES)))

    @jax.jit
    def fit_row(alpha, x0):
        obj = _make_row_objective(cos_grid, alpha, u2)
        return _batched_nelder_mead(obj, x0, _NM_ITERATIONS)

    rows = [None] * roughness_samples
    # March from rough (identity-like lobe) to smooth, warm-starting.
    x0 = jnp.zeros((angle_samples, 4), jnp.float32)
    for j in reversed(range(roughness_samples)):
        roughness = j / (roughness_samples - 1)
        alpha = jnp.float32(max(roughness * roughness, _MIN_FIT_ALPHA))
        x0, _ = fit_row(alpha, x0)
        rows[j] = np.asarray(x0)

    p = np.stack(rows, axis=0)  # [R, C, 4] in (log m00, log m11, m02, m20)
    table = np.concatenate(
        [np.exp(p[..., :2]), p[..., 2:]], axis=-1).astype(np.float32)
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        np.savez_compressed(save_path, ggx_ltc=table)
    return table


_CACHE = None


def get_ggx_ltc_table():
    global _CACHE
    if _CACHE is None:
        if os.path.exists(_DATA_PATH):
            _CACHE = jnp.asarray(np.load(_DATA_PATH)["ggx_ltc"])
        else:
            _CACHE = jnp.asarray(precompute_ggx_ltc())
    return _CACHE


def ggx_reflection_ltc_coefficients(cos_theta, roughness) -> IsotropicLTC:
    """Bilinear lookup of the fitted LTC for (cos θ, roughness) — the
    analogue of ``LTC::GGX_reflection_LTC_coefficients``."""
    table = get_ggx_ltc_table()
    r, c = table.shape[0], table.shape[1]
    x = jnp.clip(jnp.asarray(cos_theta, jnp.float32), 0.0, 1.0) * (c - 1)
    y = jnp.clip(jnp.asarray(roughness, jnp.float32), 0.0, 1.0) * (r - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, c - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, r - 2)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    t00 = table[y0, x0]
    t01 = table[y0, x0 + 1]
    t10 = table[y0 + 1, x0]
    t11 = table[y0 + 1, x0 + 1]
    v = ((1 - fy) * ((1 - fx) * t00 + fx * t01)
         + fy * ((1 - fx) * t10 + fx * t11))
    return IsotropicLTC(m00=v[..., 0], m11=v[..., 1],
                        m22=jnp.ones_like(v[..., 0]),
                        m02=v[..., 2], m20=v[..., 3])


if __name__ == "__main__":
    import time
    t0 = time.time()
    table = precompute_ggx_ltc()
    print(f"fitted {table.shape} GGX LTC table in {time.time() - t0:.1f}s "
          f"→ {_DATA_PATH}")
