"""Transmissive shading model: rough glass via combined GGX R+T.

Counterpart of ``Shading/ShadingModels/TransmissiveShading.h:22-97``:
IOR derived from specularity, energy-loss compensation from the dielectric
rho table, transmission tinted by the material tint.

Thin-walled variant: a thin sheet never refracts the path — light either
reflects off it or passes straight through, with throughput given by the
geometric series of internal bounces (``approx_thin_sheet_reflectance``,
ShadingModels/Utils.h:132-166). Both events share the GGX reflection
distribution: transmission is the reflection lobe mirrored below the
surface, which reduces to straight-through continuation for smooth sheets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.bsdf import ggx
from bifrost3d_tpu.bsdf.fresnel import dielectric_ior_from_specularity
from bifrost3d_tpu.bsdf.types import BSDFResponse, BSDFSample
from bifrost3d_tpu.shading.fittings import (
    sample_dielectric_ggx_rho,
    sample_ggx_rho,
)
from bifrost3d_tpu.shading.thin_sheet import approx_thin_sheet_reflectance

_MIN_COS = 1e-6
_FLIP = np.asarray([1.0, 1.0, -1.0], np.float32)


class TransmissiveShading(NamedTuple):
    transmission_tint: jnp.ndarray      # [..., 3]
    specularity: jnp.ndarray            # [...]
    ggx_alpha: jnp.ndarray              # [...]
    ior_i_over_o: jnp.ndarray           # [...]
    energy_loss_adjustment: jnp.ndarray  # [...]
    thin_walled: jnp.ndarray            # [...] bool
    thin_reflected: jnp.ndarray         # [..., 3]
    thin_transmitted: jnp.ndarray       # [..., 3]
    thin_rho_norm: jnp.ndarray          # [...] 1 / GGX rho (lobe normalizer)

    @staticmethod
    def create(tint, roughness, specularity, cos_theta_o,
               thin_walled=None) -> "TransmissiveShading":
        """``cos_theta_o`` is SIGNED: negative = viewed from inside.

        Specularity is clamped to the dielectric range [1e-4, 0.25] (IOR up
        to 3, the reference's MAX_DENSE_IOR) BEFORE the IOR conversion: the
        integrator evaluates every shading model on every lane and
        where-selects, so metal lanes (specularity 1 → IOR ∞) would
        otherwise produce masked-out NaNs that still poison backward passes.
        """
        medium_ior = dielectric_ior_from_specularity(
            jnp.clip(specularity, 1e-4, 0.25))
        entering = cos_theta_o >= 0.0
        ior_i_over_o = jnp.where(entering, medium_ior, 1.0 / medium_ior)
        total_rho, _ = sample_dielectric_ggx_rho(
            jnp.abs(cos_theta_o), roughness, ior_i_over_o)

        # Thin-sheet throughput (always seen from outside: thin sheets are
        # symmetric and the shading frame is flipped to the viewer's side).
        tint3 = jnp.broadcast_to(
            jnp.asarray(tint, jnp.float32),
            jnp.broadcast_shapes(jnp.shape(tint),
                                 jnp.shape(medium_ior) + (3,)))
        sheet = approx_thin_sheet_reflectance(
            jnp.abs(cos_theta_o), roughness, medium_ior, tint3)
        lobe_rho = sample_ggx_rho(jnp.abs(cos_theta_o), roughness)
        if thin_walled is None:
            thin_walled = jnp.zeros(jnp.shape(medium_ior), bool)

        return TransmissiveShading(
            transmission_tint=tint3,
            specularity=jnp.broadcast_to(specularity, ior_i_over_o.shape),
            ggx_alpha=jnp.broadcast_to(
                ggx.alpha_from_roughness(roughness), ior_i_over_o.shape),
            ior_i_over_o=ior_i_over_o,
            energy_loss_adjustment=1.0 / jnp.maximum(total_rho, 1e-5),
            thin_walled=jnp.broadcast_to(thin_walled, ior_i_over_o.shape),
            thin_reflected=sheet.reflected,
            thin_transmitted=sheet.transmitted,
            thin_rho_norm=1.0 / jnp.maximum(lobe_rho, 1e-5))

    def _thin_reflect_probability(self):
        r = jnp.mean(self.thin_reflected, axis=-1)
        t = jnp.mean(self.thin_transmitted, axis=-1)
        return r / jnp.maximum(r + t, 1e-9)

    def evaluate_with_pdf(self, wo, wi) -> BSDFResponse:
        frontside = wo[..., 2] > _MIN_COS
        r = ggx.evaluate_with_pdf(
            self.ggx_alpha, self.specularity, self.ior_i_over_o, wo, wi,
            transmission_tint=self.transmission_tint)
        thick_f = r.reflectance * self.energy_loss_adjustment[..., None]
        thick_pdf = r.pdf

        # Thin sheet: reflection lobe above, the same lobe mirrored below.
        up = wi[..., 2] >= 0.0
        wi_ref = jnp.where(up[..., None], wi, wi * _FLIP)
        lobe_f = ggx.r_evaluate(self.ggx_alpha, 1.0, wo, wi_ref)
        lobe_pdf = ggx.r_pdf(self.ggx_alpha, wo, wi_ref)
        weight = jnp.where(up[..., None], self.thin_reflected,
                           self.thin_transmitted)
        thin_f = weight * lobe_f * self.thin_rho_norm[..., None]
        p_refl = self._thin_reflect_probability()
        thin_pdf = jnp.where(up, p_refl, 1.0 - p_refl) * lobe_pdf

        tw = self.thin_walled
        f = jnp.where(tw[..., None], thin_f, thick_f)
        pdf = jnp.where(tw, thin_pdf, thick_pdf)
        return BSDFResponse(
            reflectance=jnp.where(frontside[..., None], f, 0.0),
            pdf=jnp.where(frontside, pdf, 0.0))

    def sample(self, wo, u3) -> BSDFSample:
        s = ggx.sample(self.ggx_alpha, self.specularity, self.ior_i_over_o,
                       wo, u3, transmission_tint=self.transmission_tint)
        thick_f = s.reflectance * self.energy_loss_adjustment[..., None]

        # Thin sheet: sample the reflection lobe, mirror it below the
        # surface with probability 1 - p_refl.
        sr = ggx.r_sample(self.ggx_alpha, 1.0, wo, u3[..., :2])
        p_refl = self._thin_reflect_probability()
        transmit = u3[..., 2] >= p_refl
        thin_dir = jnp.where(transmit[..., None], sr.direction * _FLIP,
                             sr.direction)
        weight = jnp.where(transmit[..., None], self.thin_transmitted,
                           self.thin_reflected)
        thin_f = weight * sr.reflectance * self.thin_rho_norm[..., None]
        thin_pdf = sr.pdf * jnp.where(transmit, 1.0 - p_refl, p_refl)

        tw = self.thin_walled
        frontside = wo[..., 2] > _MIN_COS
        return BSDFSample(
            direction=jnp.where(tw[..., None], thin_dir, s.direction),
            pdf=jnp.where(frontside, jnp.where(tw, thin_pdf, s.pdf), 0.0),
            is_delta=jnp.where(tw, sr.is_delta, s.is_delta) & frontside,
            reflectance=jnp.where(
                frontside[..., None],
                jnp.where(tw[..., None], thin_f, thick_f), 0.0))

    def rho(self, abs_cos_theta_o):
        roughness = ggx.roughness_from_alpha(self.ggx_alpha)
        total, reflected = sample_dielectric_ggx_rho(
            abs_cos_theta_o, roughness, self.ior_i_over_o)
        reflection = reflected / jnp.maximum(total, 1e-9)
        thick = (reflection[..., None]
                 + (1.0 - reflection)[..., None] * self.transmission_tint)
        thin = self.thin_reflected + self.thin_transmitted
        return jnp.where(self.thin_walled[..., None], thin, thick)
