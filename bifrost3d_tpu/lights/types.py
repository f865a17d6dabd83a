"""Light SoA container and sample result pytrees."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from bifrost3d_tpu.utils.hostbuild import host_build

LIGHT_SPHERE = 0
LIGHT_SPOT = 1
LIGHT_DIRECTIONAL = 2


class LightArray(NamedTuple):
    """Tagged struct-of-arrays of analytic lights.

    Mirrors the reference's linearized GPU light buffer
    (OptiXRenderer Types.h Light union, Renderer.cpp:852-1008):
    - sphere: position, radius, power
    - spot: position, radius (disk), direction, cos_angle, power
    - directional: direction, radiance stored in ``power``
    """

    kind: jnp.ndarray       # [l] int32
    position: jnp.ndarray   # [l, 3]
    radius: jnp.ndarray     # [l]
    power: jnp.ndarray      # [l, 3] (radiance for directional)
    direction: jnp.ndarray  # [l, 3] (spot/directional)
    cos_angle: jnp.ndarray  # [l] (spot cone)

    @property
    def count(self) -> int:
        return int(self.kind.shape[0])

    @staticmethod
    @host_build
    def build(lights) -> "LightArray":
        """lights: list of dicts with 'kind' + per-type fields."""
        l = len(lights)
        kind = np.zeros(l, np.int32)
        position = np.zeros((l, 3), np.float32)
        radius = np.zeros(l, np.float32)
        power = np.zeros((l, 3), np.float32)
        direction = np.tile(np.asarray([0, 0, 1.0], np.float32), (l, 1))
        cos_angle = np.zeros(l, np.float32)
        for i, li in enumerate(lights):
            kind[i] = li["kind"]
            position[i] = li.get("position", (0, 0, 0))
            radius[i] = li.get("radius", 0.0)
            power[i] = li.get("power", li.get("radiance", (0, 0, 0)))
            d = np.asarray(li.get("direction", (0, 0, 1)), np.float32)
            direction[i] = d / max(np.linalg.norm(d), 1e-20)
            cos_angle[i] = li.get("cos_angle", 0.0)
        return LightArray(
            kind=jnp.asarray(kind), position=jnp.asarray(position),
            radius=jnp.asarray(radius), power=jnp.asarray(power),
            direction=jnp.asarray(direction), cos_angle=jnp.asarray(cos_angle))


class LightSample(NamedTuple):
    """One next-event-estimation sample toward a light."""

    direction: jnp.ndarray  # [..., 3] unit, toward the light
    distance: jnp.ndarray   # [...] shadow-ray length
    radiance: jnp.ndarray   # [..., 3]
    pdf: jnp.ndarray        # [...] solid-angle pdf (lobe prob for deltas)
    is_delta: jnp.ndarray   # [...] bool
