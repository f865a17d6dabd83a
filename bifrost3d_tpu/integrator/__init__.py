"""Integrators: wavefront Monte-Carlo path tracers.

The reference's SIMT megakernel (one GPU thread per pixel, whole path
inline, SimpleRGPs.cu:131-140) maps to TPU as a *wavefront*: all rays
advance one bounce per step of a fused loop, with masks for terminated
lanes — the classic wavefront-integrator design (SURVEY.md §2.8 mapping).
"""

from bifrost3d_tpu.integrator.smallpt import (
    render_smallpt_accumulation,
    render_smallpt,
    SMALLPT_CAM_ORIGIN,
    SMALLPT_CAM_DIRECTION,
)
