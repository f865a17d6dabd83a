"""I/O: images (PNG/JPG/HDR/EXR-lite), OBJ + glTF loading, comparison.

Counterpart of the reference's L4 extensions (SURVEY.md §2.6):
StbImageLoader/Writer + TinyExr → :mod:`image`; ObjLoader → :mod:`obj`;
glTFLoader → :mod:`gltf`; ImageOperations → :mod:`compare`.
"""

from bifrost3d_tpu.io.image import (
    load_image,
    save_image,
    save_exr,
    load_exr,
    srgb_encode_u8,
)
from bifrost3d_tpu.io.compare import rms, ssim, mssim
from bifrost3d_tpu.io.obj import load_obj
from bifrost3d_tpu.io.gltf import load_gltf
