"""Core: engine loop, UID handles, change tracking, input.

Counterpart of the reference's L0 (``core/Bifrost/Bifrost/Core``,
SURVEY.md §2.1) and its defining architectural trick (§1): the datamodel is
the single source of truth, every manager records per-tick change bitmasks,
renderers diff-sync in ``handle_updates()`` and a tick-cleanup callback
clears notifications.

On TPU the "GPU mirror" is the immutable
:class:`~bifrost3d_tpu.scene.render_scene.RenderScene` pytree; the sync
step rebuilds only the arrays whose managers report changes and resets the
progressive accumulation, exactly mirroring the reference's
``handle_updates`` → ``accumulations = 0`` flow (Renderer.cpp:1202-1204).
"""

from bifrost3d_tpu.core.uid import TypedUIDGenerator, UID
from bifrost3d_tpu.core.bitmask import Bitmask
from bifrost3d_tpu.core.changeset import ChangeSet
from bifrost3d_tpu.core.engine import Engine, Time, Window
from bifrost3d_tpu.core.input import Keyboard, Mouse
