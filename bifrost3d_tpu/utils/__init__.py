"""Runtime utilities: checkpoint/resume and profiling.

The reference has no training-style checkpointing (SURVEY.md §5) — its
analogue is the progressive accumulation buffer and the camera screenshot
pipeline. Here the jitted render/optimizer state is a pytree, so
checkpointing is a first-class subsystem.
"""

from bifrost3d_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    latest_checkpoint,
)
from bifrost3d_tpu.utils.profiling import (
    FrameTimer,
    StageTimings,
    device_trace,
)
from bifrost3d_tpu.utils.hostbuild import host_build

__all__ = [
    "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "FrameTimer", "StageTimings", "device_trace",
    "host_build",
]
