"""Light sources: sphere / spot / directional / environment (+ presampled).

Counterpart of the reference's ``Shading/LightSources/*`` +
``Assets/InfiniteAreaLight`` (SURVEY.md §2.3, §2.4). Lights live in a
struct-of-arrays :class:`LightArray` (the GPU light buffer analogue,
Renderer.cpp:852-1008); sampling evaluates every light type branch-free and
masks by tag, which on TPU is cheaper than divergent dispatch.
"""

from bifrost3d_tpu.lights.types import (
    LightArray,
    LightSample,
    LIGHT_SPHERE,
    LIGHT_SPOT,
    LIGHT_DIRECTIONAL,
)
from bifrost3d_tpu.lights.analytic import (
    sample_light,
    evaluate_light,
    light_pdf,
    is_delta_light,
    sphere_light_sample,
    spot_light_sample,
    directional_light_sample,
)
from bifrost3d_tpu.lights.environment import (
    EnvironmentLight,
    build_environment_light,
    environment_sample,
    environment_pdf,
    environment_evaluate,
    presample_environment,
    PresampledEnvironmentLight,
    presampled_environment_sample,
    direction_to_latlong_uv,
    latlong_uv_to_direction,
)
