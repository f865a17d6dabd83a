"""Preview renderer: the rasterizer-style fast path.

Counterpart of the reference's DX11Renderer (SURVEY.md §2.5): where the
reference rasterizes a G-buffer, runs SSAO, and shades with analytic
lights + prefiltered IBL, this renderer resolves primary visibility with
the same intersection kernels (on TPU, primary-ray casting IS the
rasterizer — both are one dense visibility pass), then runs the identical
screen-space pipeline: G-buffer → SSAO → direct light + IBL → camera
effects. One jit, no progressive accumulation — the interactive preview
the viewer's 'P' key toggles against the path tracer.
"""

from bifrost3d_tpu.preview.ibl import convolve_environment, sample_ibl
from bifrost3d_tpu.preview.ssao import ssao
from bifrost3d_tpu.preview.renderer import render_preview
