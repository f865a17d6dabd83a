"""Transmissive shading model: rough glass via combined GGX R+T.

Counterpart of ``Shading/ShadingModels/TransmissiveShading.h:22-97``:
IOR derived from specularity, energy-loss compensation from the dielectric
rho table, transmission tinted by the material tint.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bifrost3d_tpu.bsdf import ggx
from bifrost3d_tpu.bsdf.fresnel import dielectric_ior_from_specularity
from bifrost3d_tpu.bsdf.types import BSDFResponse, BSDFSample
from bifrost3d_tpu.shading.fittings import sample_dielectric_ggx_rho

_MIN_COS = 1e-6


class TransmissiveShading(NamedTuple):
    transmission_tint: jnp.ndarray      # [..., 3]
    specularity: jnp.ndarray            # [...]
    ggx_alpha: jnp.ndarray              # [...]
    ior_i_over_o: jnp.ndarray           # [...]
    energy_loss_adjustment: jnp.ndarray  # [...]

    @staticmethod
    def create(tint, roughness, specularity, cos_theta_o) -> "TransmissiveShading":
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
        return TransmissiveShading(
            transmission_tint=tint,
            specularity=jnp.broadcast_to(specularity, ior_i_over_o.shape),
            ggx_alpha=jnp.broadcast_to(
                ggx.alpha_from_roughness(roughness), ior_i_over_o.shape),
            ior_i_over_o=ior_i_over_o,
            energy_loss_adjustment=1.0 / jnp.maximum(total_rho, 1e-5))

    def evaluate_with_pdf(self, wo, wi) -> BSDFResponse:
        frontside = wo[..., 2] > _MIN_COS
        r = ggx.evaluate_with_pdf(
            self.ggx_alpha, self.specularity, self.ior_i_over_o, wo, wi,
            transmission_tint=self.transmission_tint)
        return BSDFResponse(
            reflectance=jnp.where(
                frontside[..., None],
                r.reflectance * self.energy_loss_adjustment[..., None], 0.0),
            pdf=jnp.where(frontside, r.pdf, 0.0))

    def sample(self, wo, u3) -> BSDFSample:
        s = ggx.sample(self.ggx_alpha, self.specularity, self.ior_i_over_o,
                       wo, u3, transmission_tint=self.transmission_tint)
        frontside = wo[..., 2] > _MIN_COS
        return BSDFSample(
            direction=s.direction,
            pdf=jnp.where(frontside, s.pdf, 0.0),
            is_delta=s.is_delta & frontside,
            reflectance=jnp.where(
                frontside[..., None],
                s.reflectance * self.energy_loss_adjustment[..., None], 0.0))

    def rho(self, abs_cos_theta_o):
        roughness = ggx.roughness_from_alpha(self.ggx_alpha)
        total, reflected = sample_dielectric_ggx_rho(
            abs_cos_theta_o, roughness, self.ior_i_over_o)
        reflection = reflected / jnp.maximum(total, 1e-9)
        return (reflection[..., None]
                + (1.0 - reflection)[..., None] * self.transmission_tint)
