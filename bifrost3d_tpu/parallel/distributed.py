"""Multi-host distribution: process wiring, global meshes, host-local IO.

The reference is a single-GPU renderer — it has no multi-node concept at
all (SURVEY.md §2.8: the only "communication backend" is a CUDA<->D3D11
interop copy, Adaptor.cpp:48-90). This module is the TPU-native subsystem
BASELINE.json's north star requires instead: N processes (one per TPU
host), each owning its local chips, joined into one global
``jax.sharding.Mesh``; pixel rows / ray-pool lanes shard over the global
'tiles' axis, the scene replicates, and image/gradient reductions ride
``psum`` over ICI (DCN only carries the coordination plane).

Design notes (TPU-first):
- ``initialize()`` is a thin idempotent wrapper over
  ``jax.distributed.initialize``. On TPU pods the coordinator is
  autodetected from the TPU environment; elsewhere it reads the standard
  coordinator/num_processes/process_id triple (args or env).
- Rendering stays SPMD: every process executes the same jitted program over
  the global mesh; each process only materializes its local rows
  (``jax.make_array_from_process_local_data``), so a 16-host render never
  gathers the framebuffer unless the caller asks for it
  (``gather_image``).
- Verified same-host by a real 2-process CPU run (gloo cross-process
  collectives) in tests/test_distributed.py and by ``selftest`` below.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

_INITIALIZED = False


def is_initialized() -> bool:
    return _INITIALIZED


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join (or form) the distributed system. Idempotent.

    Resolution order for each field: explicit argument, then the
    ``BIFROST_COORDINATOR`` / ``BIFROST_NUM_PROCESSES`` /
    ``BIFROST_PROCESS_ID`` environment variables, then JAX's own
    autodetection (TPU pod metadata / cluster envs). Single-process runs
    may skip calling this entirely.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get("BIFROST_COORDINATOR"))
    if num_processes is None and "BIFROST_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["BIFROST_NUM_PROCESSES"])
    if process_id is None and "BIFROST_PROCESS_ID" in os.environ:
        process_id = int(os.environ["BIFROST_PROCESS_ID"])

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def global_render_mesh():
    """1D 'tiles' mesh over ALL global devices (every process's chips).

    Device order is jax's global order, which keeps each host's chips
    contiguous — so a row-sharded image keeps whole per-host slabs and the
    psum tree rides ICI within hosts before crossing DCN.
    """
    import jax
    from bifrost3d_tpu.parallel.mesh import render_mesh
    return render_mesh(jax.devices())


# ---------------------------------------------------------------------------
# Host-local <-> global array plumbing
# ---------------------------------------------------------------------------

def shard_rows_local(mesh, global_rows: int) -> tuple[int, int]:
    """This process's [start, stop) row slice of a row-sharded buffer.

    ``global_rows`` must already be padded to a multiple of the global
    device count (``pad_to_multiple``).
    """
    import jax
    n_dev = mesh.devices.size
    assert global_rows % n_dev == 0, (global_rows, n_dev)
    per_dev = global_rows // n_dev
    local = jax.local_device_count() * per_dev
    return process_index() * local, (process_index() + 1) * local


def make_global_rows(mesh, local_np: np.ndarray, global_rows: int):
    """Assemble a globally row-sharded jax.Array from this process's rows."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bifrost3d_tpu.parallel.mesh import TILE_AXIS
    sharding = NamedSharding(mesh, P(TILE_AXIS))
    global_shape = (global_rows,) + tuple(local_np.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_np), global_shape)


def gather_rows(global_array) -> np.ndarray:
    """All-gather a row-sharded global array to a host numpy array.

    Every process receives the full buffer (uses an on-device all-gather,
    so DCN carries each row once). Only for final image readback /
    checkpointing — the render loop itself never calls this.
    """
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(global_array, tiled=True))


# ---------------------------------------------------------------------------
# Multi-host renders
# ---------------------------------------------------------------------------

def make_multihost_smallpt(mesh, width: int, height: int):
    """SmallPT render over a (possibly multi-process) global mesh.

    Returns ``render(scene, accumulation) -> global [padded_h, W, 3]``
    row-sharded array. The scene pytree is replicated (identical on all
    processes — numpy leaves are broadcast by jit). Use ``gather_rows`` +
    crop for readback.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from bifrost3d_tpu.integrator.smallpt import render_smallpt_pixels
    from bifrost3d_tpu.parallel.mesh import TILE_AXIS, pad_to_multiple

    padded_h = pad_to_multiple(height, mesh.devices.size)
    lo, hi = shard_rows_local(mesh, padded_h)
    y_loc = np.broadcast_to(
        np.arange(lo, hi, dtype=np.uint32)[:, None], (hi - lo, width))
    x_loc = np.broadcast_to(
        np.arange(width, dtype=np.uint32)[None, :], (hi - lo, width))
    x_all = make_global_rows(mesh, x_loc, padded_h)
    y_all = make_global_rows(mesh, y_loc, padded_h)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P()),
             out_specs=P(TILE_AXIS))
    def _render_shard(scene, x, y, accumulation):
        return render_smallpt_pixels(scene, x, y, width, height, accumulation)

    @jax.jit
    def _render(scene, x, y, accumulation):
        return _render_shard(scene, x, y, accumulation)

    def render(scene, accumulation):
        # Globally-sharded index grids must be ARGUMENTS (closing over a
        # non-addressable global array inside jit is not allowed).
        return _render(scene, x_all, y_all,
                       jnp.asarray(accumulation, jnp.uint32))

    return render


def make_multihost_render(mesh, width: int, height: int, settings=None):
    """Flagship mesh-scene wavefront render over a global multi-host mesh.

    Same layout as ``make_sharded_render`` (parallel/render.py) but with
    host-local index-grid construction so it runs unchanged from 1 process
    x 1 chip to N hosts x M chips.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings, render_pixels_pooled)
    from bifrost3d_tpu.parallel.mesh import TILE_AXIS, pad_to_multiple

    settings = settings or RenderSettings()
    n_dev = mesh.devices.size
    padded_h = pad_to_multiple(height, n_dev)
    rows_per_dev = padded_h // n_dev
    shard_pixels = rows_per_dev * width

    # Each device renders its flat pixel range through the POOLED compacting
    # wavefront (the forward product path, as make_sharded_render). The
    # range derives from axis_index, so no global index grids are needed —
    # the same code runs from 1 process × 1 chip to N hosts × M chips.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P()),
             out_specs=P(TILE_AXIS), check_vma=False)
    def _render_shard(scene, camera, accumulation):
        start = jax.lax.axis_index(TILE_AXIS).astype(jnp.int32) * shard_pixels
        accum, _ = render_pixels_pooled(
            scene, camera, width, height, accumulation, settings,
            pool_size=min(65536, shard_pixels), pixel_start=start,
            n_pixels=shard_pixels)
        return accum.reshape(rows_per_dev, width, 3)

    @jax.jit
    def _render(scene, camera, accumulation):
        return _render_shard(scene, camera, accumulation)

    def render(scene, camera, accumulation):
        return _render(scene, camera, jnp.asarray(accumulation, jnp.uint32))

    return render


# ---------------------------------------------------------------------------
# Same-host multi-process selftest (run by tests and dryrun_multichip)
# ---------------------------------------------------------------------------

def _selftest_worker(coordinator: str, num_processes: int, process_id: int,
                     devices_per_process: int) -> None:
    """Body of one process of the selftest: N CPU processes form a
    distributed system, render SmallPT over the global mesh, psum a
    checksum, and process 0 checks the gathered image against a
    single-device render."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    import jax
    # The config route wins over env vars even when a TPU PJRT plugin
    # tramples JAX_PLATFORMS; cross-process CPU collectives need gloo
    # (without it each process builds a standalone CPU backend and
    # process_count stays 1).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    initialize(coordinator, num_processes, process_id)
    import jax.numpy as jnp

    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes * devices_per_process

    from bifrost3d_tpu.scene import smallpt_scene

    mesh = global_render_mesh()
    width, height = 32, 24
    scene = smallpt_scene()
    render = make_multihost_smallpt(mesh, width, height)
    img = render(scene, 1)
    full = gather_rows(img)[:height]

    # Cross-process collective check: global psum of the local row sums.
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from bifrost3d_tpu.parallel.mesh import TILE_AXIS

    total = jax.jit(partial(
        shard_map, mesh=mesh, in_specs=P(TILE_AXIS), out_specs=P())(
        lambda rows: jax.lax.psum(jnp.sum(rows), TILE_AXIS)))(img)
    np.testing.assert_allclose(float(total), full.sum(), rtol=1e-5)

    # Cross-process sharded TRAIN-STEP gradient (the north-star inverse
    # rendering workload): every process renders its rows, takes the local
    # gradient, and the psum all-reduce across ALL processes' devices must
    # reproduce the single-process gradient.
    from bifrost3d_tpu.integrator.smallpt import render_smallpt_pixels
    from bifrost3d_tpu.parallel.mesh import pad_to_multiple

    padded_h = pad_to_multiple(height, mesh.devices.size)
    lo, hi = shard_rows_local(mesh, padded_h)
    y_loc = np.broadcast_to(
        np.arange(lo, hi, dtype=np.uint32)[:, None], (hi - lo, width))
    x_loc = np.broadcast_to(
        np.arange(width, dtype=np.uint32)[None, :], (hi - lo, width))
    x_all = make_global_rows(mesh, x_loc, padded_h)
    y_all = make_global_rows(mesh, y_loc, padded_h)
    denom = float(width * height * 3)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS)), out_specs=P(),
             check_vma=False)
    def grad_shard(color, xs, ys):
        def local(c):
            im = render_smallpt_pixels(
                scene._replace(color=c), xs, ys, width, height,
                jnp.uint32(1))
            in_image = (ys < height)[..., None]
            return jnp.sum(jnp.where(in_image, jnp.square(im), 0.0))
        return jax.lax.psum(jax.grad(local)(color), TILE_AXIS) / denom

    g_global = np.asarray(grad_shard(scene.color, x_all, y_all))
    assert np.all(np.isfinite(g_global))

    if process_id == 0:
        from bifrost3d_tpu.integrator.smallpt import (
            render_smallpt_accumulation)
        single = np.asarray(
            render_smallpt_accumulation(scene, width, height, 1))
        np.testing.assert_allclose(full, single, rtol=1e-5, atol=1e-5)

        def full_loss(color):
            im = render_smallpt_accumulation(
                scene._replace(color=color), width, height, 1)
            return jnp.mean(jnp.square(im))

        g_ref = np.asarray(jax.grad(full_loss)(scene.color))
        np.testing.assert_allclose(g_global, g_ref, atol=1e-5, rtol=2e-3)
        print("DISTRIBUTED_SELFTEST_OK", flush=True)


def run_selftest(num_processes: int = 2, devices_per_process: int = 2,
                 timeout: float = 300.0) -> None:
    """Spawn a same-host multi-process distributed render and verify it.

    This is the multi-host code path (coordinator service, cross-process
    collectives, host-local array assembly) exercised without needing N
    hosts — the same binary layout a real TPU pod run uses.
    """
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "bifrost3d_tpu.parallel.distributed",
             "--worker", coordinator, str(num_processes), str(i),
             str(devices_per_process)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(num_processes)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"distributed selftest worker {i} failed "
                f"(rc={p.returncode}):\n{out[-4000:]}")
    if "DISTRIBUTED_SELFTEST_OK" not in outs[0]:
        raise RuntimeError(
            f"worker 0 did not report success:\n{outs[0][-4000:]}")


def _main(argv):
    if len(argv) >= 6 and argv[1] == "--worker":
        _selftest_worker(argv[2], int(argv[3]), int(argv[4]), int(argv[5]))
        return 0
    run_selftest()
    print("selftest passed")
    return 0


if __name__ == "__main__":
    import sys
    raise SystemExit(_main(sys.argv))
