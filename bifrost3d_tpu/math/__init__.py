"""Math foundation: pure-jnp vector helpers, transforms, colors, CDF tables.

TPU-first analogue of the reference's ``core/Bifrost/Bifrost/Math`` headers
(SURVEY.md §2.2). Vectors are plain ``jnp`` arrays with a trailing dimension
of size 2/3/4; every function broadcasts over leading (ray-pool / pixel)
dimensions so the whole module is wavefront-vectorized by construction.
"""

from bifrost3d_tpu.math.vec import (
    dot,
    cross,
    length,
    length_squared,
    normalize,
    lerp,
    reflect,
    refract,
    distance,
    safe_rsqrt,
    vec3,
    orthonormal_basis,
    to_local,
    to_world,
)
from bifrost3d_tpu.math.color import (
    luminance,
    srgb_to_linear,
    linear_to_srgb,
    rgb_to_hsv,
    hsv_to_rgb,
)
from bifrost3d_tpu.math.quaternion import (
    quat_identity,
    quat_from_axis_angle,
    quat_mul,
    quat_conjugate,
    quat_rotate,
    quat_look_in,
    quat_to_matrix,
    quat_normalize,
)
from bifrost3d_tpu.math.transform import (
    Transform,
    transform_identity,
    transform_point,
    transform_vector,
    transform_compose,
    transform_inverse,
    transform_look_at,
    transform_delta,
)
from bifrost3d_tpu.math.distribution1d import Distribution1D
from bifrost3d_tpu.math.distribution2d import Distribution2D
from bifrost3d_tpu.math.ltc import (
    IsotropicLTC,
    lambert_ltc_coefficients,
    oren_nayar_ltc_coefficients,
)
from bifrost3d_tpu.math.octahedral import octahedral_encode, octahedral_decode
from bifrost3d_tpu.math.morton import morton_encode_2d, morton_decode_2d
