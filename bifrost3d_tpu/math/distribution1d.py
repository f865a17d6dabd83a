"""1D CDF distribution over a discretized function.

TPU-native counterpart of the reference's ``Math/Distribution1D.h``:
the CDF is built with ``jnp.cumsum`` instead of a serial loop, and sampling
uses vectorized ``jnp.searchsorted`` instead of a per-thread binary search,
so a whole wavefront of samples is drawn in one fused op.

Semantics match the reference exactly (verified by the parity tests):
- CDF has ``n + 1`` entries normalized so ``cdf[0] = 0, cdf[n] = 1``.
- ``integral`` is the mean of the function over [0, 1].
- ``sample_continuous(u) -> (x in [0,1), pdf)`` with
  ``pdf = (cdf[i+1] - cdf[i]) * n``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Distribution1D(NamedTuple):
    cdf: jnp.ndarray       # [n + 1], cdf[0] = 0, cdf[n] = 1
    integral: jnp.ndarray  # scalar, mean of the function

    @property
    def element_count(self) -> int:
        return self.cdf.shape[-1] - 1

    @staticmethod
    def build(function) -> "Distribution1D":
        """Build from non-negative function values ``[n]`` (differentiable)."""
        f = jnp.asarray(function, jnp.float32)
        n = f.shape[-1]
        cdf = jnp.concatenate(
            [jnp.zeros(f.shape[:-1] + (1,), f.dtype), jnp.cumsum(f, axis=-1)], axis=-1)
        total = cdf[..., -1:]
        safe_total = jnp.where(total > 0, total, 1.0)
        # A zero function becomes the uniform distribution (integral stays 0),
        # mirroring how the reference avoids dividing by zero.
        uniform = jnp.arange(n + 1, dtype=f.dtype) / n
        cdf = jnp.where(total > 0, cdf / safe_total, uniform)
        return Distribution1D(cdf=cdf, integral=total[..., 0] / n)

    def evaluate(self, x):
        """Function value at continuous x in [0, 1)."""
        i = jnp.clip((x * self.element_count).astype(jnp.int32), 0, self.element_count - 1)
        pdf_discrete = self.cdf[..., 1:].take(i) - self.cdf[..., :-1].take(i)
        return pdf_discrete * self.element_count * self.integral

    def sample_discrete(self, u):
        """u in [0,1) → (index, discrete pdf)."""
        i = jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right") - 1, 0, self.element_count - 1)
        pdf = jnp.take(self.cdf, i + 1) - jnp.take(self.cdf, i)
        return i, pdf

    def sample_continuous(self, u):
        """u in [0,1) → (x in [0,1), continuous pdf)."""
        n = self.element_count
        i, pdf_discrete = self.sample_discrete(u)
        cdf_lo = jnp.take(self.cdf, i)
        safe = jnp.where(pdf_discrete > 0, pdf_discrete, 1.0)
        di = jnp.where(pdf_discrete > 0, (u - cdf_lo) / safe, 0.0)
        return (i + di) / n, pdf_discrete * n

    def pdf_discrete(self, i):
        return jnp.take(self.cdf, i + 1) - jnp.take(self.cdf, i)

    def pdf_continuous(self, x):
        n = self.element_count
        i = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
        return self.pdf_discrete(i) * n
