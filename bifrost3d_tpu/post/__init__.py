"""Camera post effects: exposure, bloom, vignette, tonemapping, film grain.

Counterpart of the reference's ``Math/CameraEffects.h`` (SURVEY.md §2.2)
+ the DX11 post chain (``DX11Renderer/CameraEffects``, SURVEY.md §2.5):
the compute-shader passes become fused jnp image ops.
"""

from bifrost3d_tpu.post.tonemap import (
    TonemappingSettings,
    CameraEffectsSettings,
    reinhard,
    filmic,
    agx,
    khronos_neutral,
    apply_tonemap,
)
from bifrost3d_tpu.post.exposure import (
    fixed_exposure,
    log_average_exposure,
    histogram_exposure,
    luminance_histogram,
)
from bifrost3d_tpu.post.bloom import gaussian_bloom
from bifrost3d_tpu.post.pipeline import process
