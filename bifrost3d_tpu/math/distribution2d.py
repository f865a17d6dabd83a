"""2D CDF distribution: marginal CDF over rows + conditional CDF per row.

TPU-native counterpart of the reference's ``Math/Distribution2D.h`` (used by
``Assets/InfiniteAreaLight.h:38`` for environment-map importance sampling).
CDFs are built with cumsum and sampled with vectorized searchsorted; per-row
conditional search uses a batched searchsorted via ``jax.vmap``-free gather
arithmetic so a million environment samples are drawn in one op.

Conventions match the reference:
- marginal CDF ``[h + 1]`` over rows (the v axis), conditional ``[h, w + 1]``.
- ``sample_continuous(u2) -> ((u, v) in [0,1)^2, pdf)`` with
  ``pdf = marginal_pdf * conditional_pdf * w * h``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def _searchsorted_rows(cdf_rows, u):
    """Vectorized per-row binary search.

    cdf_rows: [..., n+1] row-wise CDFs; u: [...] samples (one per row).
    Returns index i per row with cdf[i] <= u < cdf[i+1].
    """
    # Compare u against every entry and count how many are <= u. The rows are
    # small (env-map width), and a vectorized compare+sum maps to the VPU far
    # better than a serial binary search.
    le = cdf_rows <= u[..., None]
    i = jnp.sum(le, axis=-1) - 1
    return jnp.clip(i, 0, cdf_rows.shape[-1] - 2)


class Distribution2D(NamedTuple):
    marginal_cdf: jnp.ndarray     # [h + 1]
    conditional_cdf: jnp.ndarray  # [h, w + 1]
    integral: jnp.ndarray         # scalar, mean of the function

    @property
    def width(self) -> int:
        return self.conditional_cdf.shape[-1] - 1

    @property
    def height(self) -> int:
        return self.marginal_cdf.shape[-1] - 1

    @staticmethod
    def build(function) -> "Distribution2D":
        """Build from non-negative function ``[h, w]`` (differentiable)."""
        f = jnp.asarray(function, jnp.float32)
        h, w = f.shape[-2], f.shape[-1]
        row_sums = jnp.sum(f, axis=-1)                      # [h]
        # Conditional CDF per row.
        ccdf = jnp.concatenate([jnp.zeros((h, 1), f.dtype), jnp.cumsum(f, axis=-1)], axis=-1)
        safe_rows = jnp.where(row_sums > 0, row_sums, 1.0)[..., None]
        uniform_row = jnp.arange(w + 1, dtype=f.dtype) / w
        ccdf = jnp.where(row_sums[..., None] > 0, ccdf / safe_rows, uniform_row)
        # Marginal CDF over rows.
        mcdf = jnp.concatenate([jnp.zeros(1, f.dtype), jnp.cumsum(row_sums)], axis=-1)
        total = mcdf[-1]
        safe_total = jnp.where(total > 0, total, 1.0)
        uniform = jnp.arange(h + 1, dtype=f.dtype) / h
        mcdf = jnp.where(total > 0, mcdf / safe_total, uniform)
        return Distribution2D(
            marginal_cdf=mcdf, conditional_cdf=ccdf, integral=total / (w * h))

    def sample_continuous(self, u2):
        """u2: [..., 2] in [0,1)^2 → ((u, v) [..., 2], pdf [...])."""
        w, h = self.width, self.height
        ux, uy = u2[..., 0], u2[..., 1]
        y = jnp.clip(jnp.searchsorted(self.marginal_cdf, uy, side="right") - 1, 0, h - 1)
        m_lo = jnp.take(self.marginal_cdf, y)
        m_pdf = jnp.take(self.marginal_cdf, y + 1) - m_lo
        dy = jnp.where(m_pdf > 0, (uy - m_lo) / jnp.where(m_pdf > 0, m_pdf, 1.0), 0.0)

        rows = self.conditional_cdf[y]                      # [..., w+1]
        x = _searchsorted_rows(rows, ux)
        c_lo = jnp.take_along_axis(rows, x[..., None], axis=-1)[..., 0]
        c_hi = jnp.take_along_axis(rows, x[..., None] + 1, axis=-1)[..., 0]
        c_pdf = c_hi - c_lo
        dx = jnp.where(c_pdf > 0, (ux - c_lo) / jnp.where(c_pdf > 0, c_pdf, 1.0), 0.0)

        uv = jnp.stack([(x + dx) / w, (y + dy) / h], axis=-1)
        pdf = m_pdf * c_pdf * (w * h)
        return uv, pdf

    def pdf_continuous(self, uv):
        w, h = self.width, self.height
        x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        m_pdf = jnp.take(self.marginal_cdf, y + 1) - jnp.take(self.marginal_cdf, y)
        rows = self.conditional_cdf[y]
        c_lo = jnp.take_along_axis(rows, x[..., None], axis=-1)[..., 0]
        c_hi = jnp.take_along_axis(rows, x[..., None] + 1, axis=-1)[..., 0]
        return m_pdf * (c_hi - c_lo) * (w * h)

    def evaluate(self, uv):
        return self.pdf_continuous(uv) * self.integral
