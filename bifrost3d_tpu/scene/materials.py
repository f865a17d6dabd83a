"""Materials: struct-of-arrays container + factory presets.

Counterpart of ``Assets/Material.h`` (SURVEY.md §2.3): shading model,
tint + roughness, specularity, metallic, coat, coat_roughness,
coverage/cutout-threshold, transmission, emission, flags (ThinWalled,
Cutout), plus named constants (metal tints, IORs).

Textures: per-material texture slots reference a shared
:class:`~bifrost3d_tpu.io.texture.TextureBank` (SURVEY.md §2.3 Textures);
``-1`` means untextured.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from bifrost3d_tpu.utils.hostbuild import host_build

from bifrost3d_tpu.bsdf.fresnel import dielectric_specularity

SHADING_DEFAULT = 0
SHADING_DIFFUSE = 1
SHADING_TRANSMISSIVE = 2

FLAG_THIN_WALLED = 1
FLAG_CUTOUT = 2

# Indices of refraction (Material.h:44-49).
AIR_IOR = 1.0003
ICE_IOR = 1.31
WATER_IOR = 1.33
GLASS_IOR = 1.52
DIAMOND_IOR = 2.42

def _specularity(ior_o, ior_i):
    # Plain-float mirror of bsdf.fresnel.dielectric_specularity: module-level
    # constants must not touch jnp, or importing the package would initialize
    # the XLA backend and break jax.distributed.initialize (multi-host).
    return ((ior_o - ior_i) / (ior_o + ior_i)) ** 2


DEFAULT_SPECULARITY = 0.04
ICE_SPECULARITY = _specularity(AIR_IOR, ICE_IOR)
WATER_SPECULARITY = _specularity(AIR_IOR, WATER_IOR)
GLASS_SPECULARITY = _specularity(AIR_IOR, GLASS_IOR)
DIAMOND_SPECULARITY = _specularity(AIR_IOR, DIAMOND_IOR)

# Metal tints (Material.h:62-72, UE4 physically-based materials reference).
IRON_TINT = (0.560, 0.570, 0.580)
SILVER_TINT = (0.972, 0.960, 0.915)
ALUMINUM_TINT = (0.913, 0.921, 0.925)
GOLD_TINT = (1.000, 0.766, 0.336)
COPPER_TINT = (0.955, 0.637, 0.538)
CHROMIUM_TINT = (0.550, 0.556, 0.554)
NICKEL_TINT = (0.660, 0.609, 0.526)
TITANIUM_TINT = (0.542, 0.497, 0.449)
COBALT_TINT = (0.662, 0.655, 0.634)
PLATINUM_TINT = (0.672, 0.637, 0.585)


class MaterialArray(NamedTuple):
    shading_model: jnp.ndarray   # [m] int32
    tint: jnp.ndarray            # [m, 3]
    roughness: jnp.ndarray       # [m]
    specularity: jnp.ndarray     # [m]
    metallic: jnp.ndarray        # [m]
    coat: jnp.ndarray            # [m]
    coat_roughness: jnp.ndarray  # [m]
    coverage: jnp.ndarray        # [m] (cutout threshold when FLAG_CUTOUT)
    transmission: jnp.ndarray    # [m]
    emission: jnp.ndarray        # [m, 3]
    flags: jnp.ndarray           # [m] int32 bitmask
    tint_roughness_texture: jnp.ndarray  # [m] int32 (-1 = none)
    metallic_texture: jnp.ndarray        # [m] int32
    coverage_texture: jnp.ndarray        # [m] int32

    @property
    def count(self) -> int:
        return int(self.shading_model.shape[0])

    def is_thin_walled(self, index):
        return (self.flags[index] & FLAG_THIN_WALLED) != 0

    def is_cutout(self, index):
        return (self.flags[index] & FLAG_CUTOUT) != 0

    def is_transmissive(self, index):
        return self.shading_model[index] == SHADING_TRANSMISSIVE

    def gather(self, index) -> "MaterialArray":
        """Fetch every field for per-lane ``index`` with ONE one-hot matmul.

        TPU gathers cost ~0.5 ms per 65k-lane fetch regardless of fetched
        width (per-index, not per-element — see BASELINE.md, one-hot rho
        fetches), so the ~12 separate ``mats.X[idx]`` fetches in the
        wavefront step cost more than the whole trace. Packing the table
        into one [m, 18] matrix and contracting with the one-hot index row
        runs on the MXU instead. Integer fields (flags, shading model,
        texture ids) stay exact: products are 0/1 × small int, sums are
        exact in f32 at HIGHEST precision.

        Tables above 512 materials fall back to the packed row gather
        (mirroring _fetch_tri_attributes' t<=512 guard): a [lanes, m]
        one-hot is O(lanes·m) compute+memory and loses to the row gather
        for glTF scenes with hundreds of materials. ``index`` is clipped
        to [0, m-1] either way (NumPy-style clamp, so a stray invalid id
        can't silently decode texture slot 0 from an all-zero row).

        Requires finite table entries: a NaN/Inf row would poison every
        lane through the one-hot matmul (0·Inf = NaN); ``build`` asserts
        this at host-build time.

        Returns a MaterialArray whose fields have ``index``'s batch shape
        (use field access directly — do NOT re-index the result).
        """
        import jax

        packed = jnp.concatenate([
            self.shading_model.astype(jnp.float32)[:, None],
            self.tint,
            self.roughness[:, None],
            self.specularity[:, None],
            self.metallic[:, None],
            self.coat[:, None],
            self.coat_roughness[:, None],
            self.coverage[:, None],
            self.transmission[:, None],
            self.emission,
            self.flags.astype(jnp.float32)[:, None],
            self.tint_roughness_texture.astype(jnp.float32)[:, None],
            self.metallic_texture.astype(jnp.float32)[:, None],
            self.coverage_texture.astype(jnp.float32)[:, None],
        ], axis=1)  # [m, 18]
        m = packed.shape[0]
        index = jnp.clip(index, 0, m - 1)
        if m <= 512:
            one_hot = (index[..., None] == jnp.arange(m, dtype=index.dtype)
                       ).astype(jnp.float32)
            rows = jnp.einsum('...m,mk->...k', one_hot, packed,
                              precision=jax.lax.Precision.HIGHEST)
        else:
            rows = packed[index]

        def as_int(col):
            return jnp.round(col).astype(jnp.int32)

        return MaterialArray(
            shading_model=as_int(rows[..., 0]),
            tint=rows[..., 1:4],
            roughness=rows[..., 4],
            specularity=rows[..., 5],
            metallic=rows[..., 6],
            coat=rows[..., 7],
            coat_roughness=rows[..., 8],
            coverage=rows[..., 9],
            transmission=rows[..., 10],
            emission=rows[..., 11:14],
            flags=as_int(rows[..., 14]),
            tint_roughness_texture=as_int(rows[..., 15]),
            metallic_texture=as_int(rows[..., 16]),
            coverage_texture=as_int(rows[..., 17]),
        )

    @staticmethod
    @host_build
    def build(materials) -> "MaterialArray":
        """materials: list of dicts (see factory helpers below)."""
        m = len(materials)

        def field(name, default, shape=()):
            arr = np.full((m,) + shape, default, np.float32)
            for i, mat in enumerate(materials):
                if name in mat:
                    arr[i] = mat[name]
            return arr

        def ifield(name, default):
            arr = np.full(m, default, np.int32)
            for i, mat in enumerate(materials):
                if name in mat:
                    arr[i] = mat[name]
            return arr

        # Finite-table precondition for the one-hot gather (see gather()):
        # one non-finite entry would NaN-poison every lane via 0·Inf.
        for i, mat in enumerate(materials):
            for key, value in mat.items():
                if key != "flags" and not np.all(np.isfinite(
                        np.asarray(value, np.float64))):
                    raise ValueError(
                        f"material {i} field {key!r} is not finite: {value}")

        return MaterialArray(
            shading_model=jnp.asarray(ifield("shading_model", SHADING_DEFAULT)),
            tint=jnp.asarray(field("tint", 1.0, (3,))),
            roughness=jnp.asarray(field("roughness", 0.5)),
            specularity=jnp.asarray(field("specularity", DEFAULT_SPECULARITY)),
            metallic=jnp.asarray(field("metallic", 0.0)),
            coat=jnp.asarray(field("coat", 0.0)),
            coat_roughness=jnp.asarray(field("coat_roughness", 0.0)),
            coverage=jnp.asarray(field("coverage", 1.0)),
            transmission=jnp.asarray(field("transmission", 0.0)),
            emission=jnp.asarray(field("emission", 0.0, (3,))),
            flags=jnp.asarray(ifield("flags", 0)),
            tint_roughness_texture=jnp.asarray(ifield("tint_roughness_texture", -1)),
            metallic_texture=jnp.asarray(ifield("metallic_texture", -1)),
            coverage_texture=jnp.asarray(ifield("coverage_texture", -1)),
        )


# Factory presets (Material.h:262-287).

def dielectric(tint, roughness, specularity=DEFAULT_SPECULARITY, **kw):
    return dict(tint=tint, roughness=roughness, specularity=specularity, **kw)


def metal(tint, roughness, **kw):
    return dict(tint=tint, roughness=roughness, specularity=1.0, metallic=1.0, **kw)


def coated_dielectric(tint, roughness, specularity=DEFAULT_SPECULARITY,
                      coat_roughness=0.0, **kw):
    return dict(tint=tint, roughness=roughness, specularity=specularity,
                coat=1.0, coat_roughness=coat_roughness, **kw)


def transmissive(tint, roughness, specularity=GLASS_SPECULARITY, **kw):
    return dict(shading_model=SHADING_TRANSMISSIVE, tint=tint,
                roughness=roughness, specularity=specularity, **kw)


def emissive(radiance, **kw):
    return dict(tint=(0, 0, 0), emission=radiance, **kw)
