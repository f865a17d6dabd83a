"""Practical hash-based Owen-scrambled Sobol (Burley 2020).

Behavioral counterpart of the reference's ``OptiXRenderer/RNG.h``
``PracticalScrambledSobol`` (SURVEY.md §2.4): 4D Sobol points indexed by
(accumulation index, pixel hash, dimension), Owen-scrambled with the cessen
hash, with the per-path dimension scheme ``dimension = 8*bounce + offset``
(offsets below) from ``OptiXRenderer/Types.h:422-427``.

TPU redesign: the per-bit serial Sobol loop becomes a masked XOR-reduction
over a (32, 4) direction-number matrix — one vectorized op for the whole
wavefront, no data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bifrost3d_tpu.sampling.hashes import (
    cessen_owen_hash,
    pcg2d,
    reverse_bits,
    uint_to_unit_float,
)


class Dimension:
    """QMC dimension offsets within a bounce (Types.h:422-427): 8 dims/bounce."""

    CAMERA = 0   # camera ray jitter / lens
    NEE = 1      # next-event-estimation light sample
    BSDF = 2     # BSDF direction sample
    RR = 3       # russian roulette (ours; reference folds RR elsewhere)
    PER_BOUNCE = 8


def _sobol_direction_numbers() -> np.ndarray:
    """First four dimensions of the standard Sobol direction numbers.

    Dim 0 is the van-der-Corput matrix; dims 1-3 are generated from the
    classic primitive polynomials (x+1), (x^2+x+1), (x^3+x+1) with initial
    direction numbers m = (1), (1,3), (1,3,1) — the same standard table the
    reference embeds (RNG.h sobol_direction_numbers).
    """
    polys = [None, 0b11, 0b111, 0b1011]  # None = vdC special case
    init_m = [None, [1], [1, 3], [1, 3, 1]]
    v = np.zeros((4, 32), dtype=np.uint64)
    v[0] = [1 << (31 - i) for i in range(32)]
    for d in range(1, 4):
        poly = polys[d]
        s = poly.bit_length() - 1  # degree
        m = list(init_m[d])
        for i in range(s, 32):
            # Joe & Kuo recurrence:
            #   m_i = (m_{i-s} << s) ^ m_{i-s} ^ XOR_{k=1}^{s-1} a_k (m_{i-k} << k)
            mi = m[i - s] ^ (m[i - s] << s)
            for k in range(1, s):
                if (poly >> (s - k)) & 1:
                    mi ^= m[i - k] << k
            m.append(mi)
        for i in range(32):
            v[d, i] = m[i] << (31 - i)
    return v.astype(np.uint32)


_DIRECTIONS = _sobol_direction_numbers()  # [4, 32] uint32 (numpy: no backend init at import)


def _nested_uniform_scramble(x, seed):
    """Owen scramble in base 2 via bit-reversed cessen hash (RNG.h:253-258)."""
    return reverse_bits(cessen_owen_hash(reverse_bits(x), seed))


def _hash_combine(seed, v):
    seed = jnp.asarray(seed).astype(jnp.uint32)
    v = jnp.uint32(v)
    return seed ^ (v + (seed << jnp.uint32(6)) + (seed >> jnp.uint32(2)))


def _sobol_4d_uint(index):
    """Unscrambled 4D Sobol point for uint32 ``index`` ([...]) → [..., 4]."""
    index = jnp.asarray(index).astype(jnp.uint32)
    # Masked XOR-reduce: res[d] = XOR_bit (bit_set * directions[d, bit]).
    # Unrolled so XLA fuses it into 32 elementwise ops without materializing a
    # [..., 4, 32] intermediate for the whole wavefront.
    res = jnp.zeros(index.shape + (4,), jnp.uint32)
    for b in range(32):
        bit = (index[..., None] >> jnp.uint32(b)) & jnp.uint32(1)
        res = res ^ (bit * _DIRECTIONS[:, b])
    return res


def sobol_sample_4d_uint(index, seed):
    """Owen-scrambled 4D Sobol sample → uint32 [..., 4].

    Index is Owen-shuffled by ``seed``, then each output dimension is
    Owen-scrambled with a distinct derived seed — bit-exact with the
    reference's ``PracticalScrambledSobol::sample4ui`` (RNG.h:238-293,
    verified by tests/test_sampling.py golden vectors).
    """
    index = _nested_uniform_scramble(jnp.asarray(index).astype(jnp.uint32), seed)
    xs = _sobol_4d_uint(index)
    scrambled = [
        _nested_uniform_scramble(xs[..., d], _hash_combine(seed, d)) for d in range(4)
    ]
    return jnp.stack(scrambled, axis=-1)


def sobol_sample_4d(index, seed):
    """Owen-scrambled 4D Sobol sample → float [..., 4] in [0, 1)."""
    return uint_to_unit_float(sobol_sample_4d_uint(index, seed))


def path_rng_4d(accumulation_count, pixel_hash, dimension):
    """Path-tracer helper (RNG.h sample4f): seed = pcg2d(pixel_hash, dim).x.

    All arguments broadcast; returns float [..., 4] in [0, 1). Dimensions can
    be sampled out of order — the property the reference calls out as the
    reason for hashing instead of sequential reseeding.
    """
    seed, _ = pcg2d(pixel_hash, dimension)
    return sobol_sample_4d(accumulation_count, seed)
