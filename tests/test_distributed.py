"""Multi-process (multi-host code path) distribution tests.

The reference has no distributed concepts (SURVEY.md §2.8); this validates
the TPU-native subsystem BASELINE.json requires: N processes form one
global mesh via ``jax.distributed.initialize``, pixel rows shard globally,
cross-process collectives reduce, and the result matches the single-device
render. Runs the REAL multi-process wiring (coordinator service + gloo CPU
collectives) as same-host subprocesses — the same code path a TPU pod uses.
"""

import numpy as np
import pytest


def test_two_process_distributed_render_matches_single_device():
    from bifrost3d_tpu.parallel.distributed import run_selftest
    run_selftest(num_processes=2, devices_per_process=2)


def test_row_sharding_bookkeeping():
    """shard_rows_local partitions [0, rows) exactly across processes."""
    import jax
    from bifrost3d_tpu.parallel.distributed import shard_rows_local
    from bifrost3d_tpu.parallel.mesh import pad_to_multiple, render_mesh

    mesh = render_mesh()  # 8 virtual devices, single process
    rows = pad_to_multiple(37, mesh.devices.size)
    lo, hi = shard_rows_local(mesh, rows)
    assert lo == 0 and hi == rows  # one process owns everything


def test_make_global_rows_single_process_roundtrip():
    from bifrost3d_tpu.parallel.distributed import (
        gather_rows, make_global_rows)
    from bifrost3d_tpu.parallel.mesh import render_mesh

    mesh = render_mesh()
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_rows(mesh, local, 16)
    np.testing.assert_array_equal(gather_rows(arr), local)


def test_multihost_mesh_render_matches_unsharded():
    """The flagship wavefront through make_multihost_render (single
    process, 8 virtual devices) is allclose to the plain render."""
    import jax.numpy as jnp
    from bifrost3d_tpu.apps.scenes import create_cornell_box
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings, render_sample)
    from bifrost3d_tpu.parallel.distributed import (
        gather_rows, make_multihost_render)
    from bifrost3d_tpu.parallel.mesh import render_mesh

    scene, cam = create_cornell_box()
    w = h = 16
    settings = RenderSettings(max_bounce_count=2)
    mesh = render_mesh()
    render = make_multihost_render(mesh, w, h, settings)
    img = gather_rows(render(scene, cam, 0))[:h]
    ref = np.asarray(render_sample(scene, cam, w, h, jnp.uint32(0), settings))
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-5)
