"""Device-mesh sharding for distributed rendering.

The reference is single-GPU (SURVEY.md §2.8) — this subsystem is the
TPU-native addition required by BASELINE.json: pixel tiles / rays shard
across the devices of a ``jax.sharding.Mesh`` (ICI-connected chips, then
multi-host), the scene replicates HBM-resident on every device, and image /
gradient reductions ride ``psum`` over ICI.
"""

from bifrost3d_tpu.parallel.mesh import (
    render_mesh,
    tile_sharding,
    replicated_sharding,
    pad_to_multiple,
)
from bifrost3d_tpu.parallel.render import (
    render_smallpt_sharded,
    make_sharded_smallpt,
    make_sharded_render,
    make_sharded_train_step,
)
from bifrost3d_tpu.parallel.distributed import (
    initialize as initialize_distributed,
    global_render_mesh,
    make_multihost_smallpt,
    make_multihost_render,
    make_global_rows,
    gather_rows,
    shard_rows_local,
)
