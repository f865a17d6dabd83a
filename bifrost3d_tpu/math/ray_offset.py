"""Scale-robust self-intersection avoidance (RT Gems ch. 6).

Counterpart of the reference's ``offset_ray_origin``
(OptiXRenderer/Utils.h:372-397): instead of an epsilon scaled by scene
extent — which under-offsets huge scenes and over-offsets tiny ones — the
hit position is nudged a fixed number of ULPs along the geometric normal by
integer arithmetic on the float bits, falling back to a small absolute
offset near the origin where the float grid is dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ORIGIN = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0


@jax.custom_jvp
def offset_ray_origin(position, geo_normal):
    """Offset ``position`` [..., 3] along ``geo_normal`` [..., 3] so a ray
    restarted there cannot re-hit the surface it left (Utils.h:372-397).

    ``geo_normal`` must point toward the side the new ray travels into
    (flip it before calling for transmission/passthrough).

    Differentiation: the bit-level nudge is a sub-ULP-scale perturbation of
    the identity in ``position``; its JVP passes the position tangent
    through unchanged (bitcasts have no derivative rule of their own).
    """
    of_i = (_INT_SCALE * geo_normal).astype(jnp.int32)
    p_int = jax.lax.bitcast_convert_type(position, jnp.int32)
    p_adj = p_int + jnp.where(position < 0.0, -of_i, of_i)
    p_i = jax.lax.bitcast_convert_type(p_adj, jnp.float32)
    return jnp.where(jnp.abs(position) < _ORIGIN,
                     position + _FLOAT_SCALE * geo_normal, p_i)


@offset_ray_origin.defjvp
def _offset_ray_origin_jvp(primals, tangents):
    position, geo_normal = primals
    d_position, _ = tangents
    return offset_ray_origin(position, geo_normal), d_position

