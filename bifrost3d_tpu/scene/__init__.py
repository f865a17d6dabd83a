"""Scene descriptions: analytic sphere scenes and the mesh datamodel.

Counterpart of the reference's ``core/Bifrost/Bifrost/Scene`` + the SmallPT
scene (SURVEY.md §2.3, §2.7). Scenes are pytrees of device arrays — the
TPU-idiomatic replacement for the reference's UID-indexed mutable managers
is rebuild-and-donate: host-side builders produce immutable array bundles
the integrator closes over.
"""

from bifrost3d_tpu.scene.spheres import (
    SphereScene,
    smallpt_scene,
    smallvpt_scene,
    intersect_spheres,
    BSDF_DIFFUSE,
    BSDF_SPECULAR,
    BSDF_GLASS,
)
from bifrost3d_tpu.scene.camera import (
    PinholeCamera,
    perspective_camera,
    camera_rays,
    camera_ray_directions,
)
