"""Sampling: RNG hashes, Owen-scrambled Sobol, PMJ sequences, samplers.

TPU-native counterpart of the reference's ``Math/RNG.h`` +
``OptiXRenderer/RNG.h`` + ``OptiXRenderer/Distributions.h`` (SURVEY.md §2.2,
§2.4). Everything operates on uint32 arrays and broadcasts over the
wavefront; no stateful generators — sample values are pure functions of
(sample index, pixel hash, dimension), which is what makes progressive
rendering deterministic and shardable.
"""

from bifrost3d_tpu.sampling.hashes import (
    reverse_bits,
    van_der_corput,
    sobol2,
    teschner_hash,
    jenkins_hash,
    laine_karras_hash,
    cessen_owen_hash,
    pcg2d,
    lcg_next,
    uint_to_unit_float,
)
from bifrost3d_tpu.sampling.sobol import sobol_sample_4d, path_rng_4d, Dimension
from bifrost3d_tpu.sampling.distributions import (
    cosine_hemisphere_sample,
    cosine_hemisphere_pdf,
    uniform_hemisphere_sample,
    uniform_sphere_sample,
    concentric_disk_sample,
    cone_sample,
    cone_pdf,
    ggx_ndf_sample,
    ggx_ndf_pdf,
    ggx_vndf_sample,
    ggx_vndf_pdf,
    ggx_bounded_vndf_sample,
    ggx_bounded_vndf_pdf,
    henyey_greenstein_sample,
    henyey_greenstein_phase,
    exponential_distance_sample,
)
from bifrost3d_tpu.sampling.pmj import pmj02_bn_samples
