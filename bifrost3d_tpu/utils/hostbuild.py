"""Host-side construction helper: build on CPU, upload once.

Scene/asset construction (mesh packing, material tables, camera matrices,
BVH builds) is a chain of tiny array ops. Running those on the accelerator
is pathological when the device sits behind a network tunnel: every
``jnp.asarray``/``.at[].set``/``np.asarray(jax_array)`` costs a round trip
(measured ~0.2-1.7 s each on the axon-tunneled TPU — a CornellBox build
took 304 s). The reference builds scenes host-side too and uploads in one
``handle_updates`` sync (Renderer.cpp:578-1205); :func:`host_build` is that
boundary: the wrapped builder runs with the CPU backend as the default
device, and its result pytree transfers to the accelerator in one batched
``jax.device_put``.
"""

from __future__ import annotations

import functools

import jax


def _default_device():
    return jax.devices()[0]


def host_build(fn):
    """Decorator: run ``fn`` with the host CPU as jax's default device, then
    ``device_put`` the returned pytree to the real default device in one
    batched transfer. No-op placement-wise when the default backend IS cpu
    (tests, dryruns)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        target = _default_device()
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            out = fn(*args, **kwargs)
        if target.platform == "cpu":
            return out
        return jax.device_put(out, target)

    return wrapper
