"""Integer hash functions and quasi-random helpers on uint32 arrays.

Behavioral counterparts of the reference's ``OptiXRenderer/RNG.h:21-170`` and
``Math/RNG.h:21-90``: identical hash chains (LCG, pcg2d, Laine-Karras,
cessen-Owen, Teschner, Jenkins, van-der-Corput/Sobol-2D) so that rendered
images are directly comparable with the reference's sample sequences.
All functions are elementwise over uint32 jnp arrays (VPU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

UINT_NORMALIZER = np.float32(1.0 / 4294967296.0)  # 2^-32

_LCG_MULTIPLIER = np.uint32(1664525)
_LCG_INCREMENT = np.uint32(1013904223)


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def uint_to_unit_float(x):
    """uint32 → float in [0, 1), matching ``x * (1/2^32)`` in the reference."""
    return _u32(x).astype(jnp.float32) * UINT_NORMALIZER


def reverse_bits(x):
    """Bit-reversal of uint32 (Math/RNG.h reverse_bits)."""
    x = _u32(x)
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return (x << 16) | (x >> 16)


def van_der_corput(n, scramble):
    """Base-2 radical inverse with XOR scramble → float [0, 1)."""
    return uint_to_unit_float(reverse_bits(n) ^ _u32(scramble))


def sobol2(n, scramble):
    """Second Sobol dimension with XOR scramble → float [0, 1).

    The reference's serial loop (RNG.h sobol2) XORs ``v = 0x80000000 >> i``
    progressively; we unroll over the 32 bits, masked — identical output,
    vector-friendly.
    """
    n = _u32(n)
    scramble = jnp.broadcast_to(_u32(scramble), n.shape).astype(jnp.uint32)
    v = jnp.uint32(1 << 31)
    for bit in range(32):
        use = ((n >> jnp.uint32(bit)) & jnp.uint32(1)).astype(jnp.uint32)
        scramble = scramble ^ (use * v)
        # v ^= v >> 1 progression of the direction numbers.
        v = v ^ (v >> jnp.uint32(1))
    return uint_to_unit_float(scramble)


def teschner_hash(x, y, z=None):
    """Teschner et al. 2003 spatial hash (RNG.h teschner_hash)."""
    h = _u32(x) * jnp.uint32(73856093) ^ _u32(y) * jnp.uint32(19349669)
    if z is not None:
        h = h ^ _u32(z) * jnp.uint32(83492791)
    return h


def jenkins_hash(x):
    """Jenkins one-at-a-time style avalanche hash (Math/RNG.h jenkins_hash)."""
    x = _u32(x)
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


def laine_karras_hash(x, seed):
    """Laine-Karras 2011 hash used for fast Owen scrambling."""
    x = _u32(x) + _u32(seed)
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def cessen_owen_hash(x, seed):
    """cessen's improved LK hash (pbrt-4 / Blender Cycles; RNG.h:150-160)."""
    x = _u32(x)
    seed = _u32(seed)
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> jnp.uint32(16)) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


def pcg2d(x, y):
    """pcg2d hash (Jarzynski et al. 2020): (uint32, uint32) → (uint32, uint32).

    Used by the reference for per-pixel decorrelation seeds
    (SimpleRGPs.cu:56-72) and for the Sobol seed chain.
    """
    x = _u32(x) * _LCG_MULTIPLIER + _LCG_INCREMENT
    y = _u32(y) * _LCG_MULTIPLIER + _LCG_INCREMENT
    x = x + y * _LCG_MULTIPLIER
    y = y + x * _LCG_MULTIPLIER
    x = x ^ (x >> jnp.uint32(16))
    y = y ^ (y >> jnp.uint32(16))
    x = x + y * _LCG_MULTIPLIER
    y = y + x * _LCG_MULTIPLIER
    x = x ^ (x >> jnp.uint32(16))
    y = y ^ (y >> jnp.uint32(16))
    return x, y


def lcg_next(state):
    """One step of the LCG (multiplier 1664525, increment 1013904223).

    Returns (new_state, float sample in [0,1)). The reference's SmallPT seeds
    it with ``jenkins_hash(pixel) ^ reverse_bits(frame)``
    (apps/SmallPT/smallpt.h:132-138).
    """
    state = _u32(state) * _LCG_MULTIPLIER + _LCG_INCREMENT
    return state, uint_to_unit_float(state)
