"""BSDFs: Lambert, Burley, energy-preserving Oren-Nayar (EON), GGX R/T.

TPU-native counterpart of the reference's ``OptiXRenderer/Shading/BSDFs/*``
(SURVEY.md §2.4). Conventions:

- Directions are in tangent space, +z = shading normal; ``wo`` points away
  from the surface toward the viewer, ``wi`` toward the light.
- Every function broadcasts over leading wavefront axes; no Python branching
  on traced values — the reference's early-outs become ``jnp.where`` masks.
- PDFs are explicit ``(value, is_delta)`` pairs (:class:`BSDFSample`), NOT
  the reference's NaN/sign-encoded ``PDF`` class (Types.h:152-204), which is
  hostile to autodiff. ``pdf <= 0`` marks an invalid/discarded sample.
"""

from bifrost3d_tpu.bsdf.types import BSDFSample, BSDFResponse
from bifrost3d_tpu.bsdf.fresnel import (
    schlick_fresnel,
    dielectric_schlick_fresnel,
    dielectric_specularity,
    conductor_specularity,
    dielectric_ior_from_specularity,
    conductor_ior_from_specularity,
    adjust_dielectric_specularity_to_exterior_medium,
    COAT_SPECULARITY,
    COAT_IOR,
    AIR_IOR,
)
from bifrost3d_tpu.bsdf import lambert, burley, oren_nayar, ggx
