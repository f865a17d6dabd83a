"""The Default shading model: EON diffuse + GGX specular + optional coat.

Counterpart of ``Shading/ShadingModels/DefaultShading.h`` (SURVEY.md §2.4)
and ``doc/DefaultMaterial/README.md``. Construction bakes, per shading
point (all vectorized over the wavefront):

- coat-modulated base roughness (OpenPBR eq. 86, Utils.h:363-367),
- dielectric/conductor specularity re-based under the coat medium,
- metallic = lerp(dielectric, conductor) of diffuse tint / specularity,
- energy conservation via the precomputed rho tables (multi-scatter
  compensation ``1/full_rho``),
- per-lobe sampling probabilities ∝ per-lobe rho.

Instead of the reference's per-hit C++ object, the "constructed" state is a
:class:`DefaultShading` pytree of arrays — one entry per wavefront lane —
built by :meth:`DefaultShading.create`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bifrost3d_tpu.bsdf import ggx, oren_nayar
from bifrost3d_tpu.bsdf.fresnel import (
    COAT_IOR,
    COAT_SPECULARITY,
    adjust_conductor_specularity_to_exterior_medium,
    adjust_dielectric_specularity_to_exterior_medium,
)
from bifrost3d_tpu.bsdf.types import BSDFResponse, BSDFSample
from bifrost3d_tpu.math.vec import lerp
from bifrost3d_tpu.shading.fittings import (
    estimate_ggx_alpha_from_max_pdf,
    sample_ggx_rho,
    sample_ggx_with_fresnel_rho,
)

_MIN_COS = 1e-6


def modulate_roughness_under_coat(base_roughness, coat_roughness):
    """OpenPBR 2025 eq. 86 (Utils.h:363-367)."""
    x_coat = 1.0 - 1.0 / COAT_IOR
    r4 = jnp.minimum(
        1.0, base_roughness**4 + 2.0 * x_coat * coat_roughness**4)
    return r4**0.25


def _specular_properties(roughness, specularity, scale, abs_cos_theta_o):
    """(alpha, reflection_scale, transmission_scale, specular_rho) per lane.

    reflection_scale folds the multi-scatter energy compensation 1/full_rho
    (ShadingModels/Utils.h SpecularRho::energy_loss_adjustment).
    """
    alpha = ggx.alpha_from_roughness(roughness)
    base = sample_ggx_with_fresnel_rho(abs_cos_theta_o, roughness)
    full = sample_ggx_rho(abs_cos_theta_o, roughness)
    reflection_scale = scale / jnp.maximum(full, 1e-5)
    if jnp.ndim(specularity) > jnp.ndim(base):
        base = base[..., None]
        full = full[..., None]
        rho = lerp(base, full, specularity) * reflection_scale[..., None]
    else:
        rho = lerp(base, full, specularity) * reflection_scale
    transmission_scale = 1.0 - rho
    return alpha, reflection_scale, transmission_scale, rho


class DefaultShading(NamedTuple):
    diffuse_tint: jnp.ndarray       # [..., 3]
    roughness: jnp.ndarray          # [...]
    specularity: jnp.ndarray        # [..., 3]
    specular_scale: jnp.ndarray     # [...]
    coat_scale: jnp.ndarray         # [...]
    coat_alpha: jnp.ndarray         # [...]
    specular_probability: jnp.ndarray  # [...]
    coat_probability: jnp.ndarray   # [...]

    # -- construction -------------------------------------------------------

    @staticmethod
    def create(tint, roughness, specularity, metallic, coat, coat_roughness,
               abs_cos_theta_o, min_roughness=None) -> "DefaultShading":
        """Vectorized constructor (DefaultShading.h:66-178).

        All inputs broadcast over the wavefront; ``min_roughness`` is the
        path-regularization floor (see :meth:`create_with_max_pdf_hint`).
        """
        if min_roughness is not None:
            roughness = jnp.maximum(roughness, min_roughness)
            coat_roughness = jnp.maximum(coat_roughness, min_roughness)
        conductor_specularity = tint

        has_coat = coat > 0.0
        # Coat-modulated base roughness.
        coat_mod = modulate_roughness_under_coat(roughness, coat_roughness)
        m_roughness = jnp.where(has_coat, lerp(roughness, coat_mod, coat), roughness)
        # Re-base specularities under the coat medium.
        coated_diel = adjust_dielectric_specularity_to_exterior_medium(
            COAT_IOR, jnp.minimum(specularity, 0.9999))
        dielectric_specularity = jnp.where(
            has_coat & (specularity < 1.0),
            lerp(specularity, coated_diel, coat), specularity)
        coated_cond = adjust_conductor_specularity_to_exterior_medium(
            COAT_IOR, jnp.clip(conductor_specularity, 0.0, 0.9999),
            jnp.zeros_like(conductor_specularity))
        coated_cond = jnp.where(jnp.isnan(coated_cond), 1.0, coated_cond)
        has_coat_c = jnp.broadcast_to(
            jnp.asarray(has_coat)[..., None] if jnp.ndim(has_coat) < jnp.ndim(conductor_specularity)
            else has_coat, conductor_specularity.shape)
        coat_c = coat[..., None] if jnp.ndim(coat) < jnp.ndim(conductor_specularity) else coat
        conductor_specularity = jnp.where(
            has_coat_c, lerp(conductor_specularity, coated_cond, coat_c),
            conductor_specularity)

        # Dielectric layer: energy-compensated specular + transmitted diffuse.
        _, specular_scale, diel_transmission, _ = _specular_properties(
            m_roughness, dielectric_specularity, 1.0, abs_cos_theta_o)
        dielectric_tint = tint * diel_transmission[..., None] \
            if jnp.ndim(diel_transmission) < jnp.ndim(tint) else tint * diel_transmission

        metallic_c = metallic[..., None] if jnp.ndim(metallic) < jnp.ndim(tint) else metallic
        m_specularity = lerp(
            jnp.broadcast_to(dielectric_specularity[..., None]
                             if jnp.ndim(dielectric_specularity) < jnp.ndim(tint)
                             else dielectric_specularity, tint.shape),
            conductor_specularity, metallic_c)
        m_diffuse_tint = dielectric_tint * (1.0 - metallic_c)

        # Coat layer: GGX with fixed IOR 1.5 / specularity 0.04.
        coat_alpha_full, coat_refl_scale, coat_transmission, coat_rho = \
            _specular_properties(coat_roughness, COAT_SPECULARITY, coat,
                                 abs_cos_theta_o)
        # coat_refl_scale already folds the coat strength (scale arg above).
        m_coat_scale = jnp.where(has_coat, coat_refl_scale, 0.0)
        m_coat_alpha = jnp.where(has_coat, coat_alpha_full, 0.0)
        coat_rho = jnp.where(has_coat, coat_rho, 0.0)
        specular_scale = jnp.where(
            has_coat, specular_scale * coat_transmission, specular_scale)
        m_diffuse_tint = jnp.where(
            (has_coat[..., None] if jnp.ndim(has_coat) < jnp.ndim(m_diffuse_tint)
             else has_coat),
            m_diffuse_tint * (coat_transmission[..., None]
                              if jnp.ndim(coat_transmission) < jnp.ndim(m_diffuse_tint)
                              else coat_transmission),
            m_diffuse_tint)

        # Sampling probabilities ∝ per-lobe rho sums.
        diffuse_rho_sum = jnp.sum(m_diffuse_tint, axis=-1)
        base = sample_ggx_with_fresnel_rho(abs_cos_theta_o, m_roughness)
        full = sample_ggx_rho(abs_cos_theta_o, m_roughness)
        spec_rho = (lerp(base[..., None], full[..., None], m_specularity)
                    * specular_scale[..., None])
        specular_rho_sum = jnp.sum(spec_rho, axis=-1)
        coat_rho_sum = 3.0 * coat_rho
        recip = 1.0 / jnp.maximum(
            diffuse_rho_sum + specular_rho_sum + coat_rho_sum, 1e-9)
        return DefaultShading(
            diffuse_tint=m_diffuse_tint,
            roughness=jnp.broadcast_to(m_roughness, diffuse_rho_sum.shape),
            specularity=m_specularity,
            specular_scale=jnp.broadcast_to(specular_scale, diffuse_rho_sum.shape),
            coat_scale=jnp.broadcast_to(m_coat_scale, diffuse_rho_sum.shape),
            coat_alpha=jnp.broadcast_to(m_coat_alpha, diffuse_rho_sum.shape),
            specular_probability=specular_rho_sum * recip,
            coat_probability=coat_rho_sum * recip,
        )

    @staticmethod
    def create_with_max_pdf_hint(tint, roughness, specularity, metallic, coat,
                                 coat_roughness, abs_cos_theta_o, max_pdf,
                                 pdf_is_delta=None) -> "DefaultShading":
        """Path regularization (DefaultShading.h:175-178): clamp roughness
        from below using the previous bounce's max BSDF PDF."""
        min_alpha = estimate_ggx_alpha_from_max_pdf(abs_cos_theta_o, max_pdf)
        min_roughness = ggx.roughness_from_alpha(min_alpha)
        if pdf_is_delta is not None:
            min_roughness = jnp.where(pdf_is_delta, 0.0, min_roughness)
        return DefaultShading.create(
            tint, roughness, specularity, metallic, coat, coat_roughness,
            abs_cos_theta_o, min_roughness=min_roughness)

    # -- probabilities ------------------------------------------------------

    @property
    def diffuse_probability(self):
        return 1.0 - self.specular_probability - self.coat_probability

    @property
    def specular_alpha(self):
        return ggx.alpha_from_roughness(self.roughness)

    # -- evaluation ---------------------------------------------------------

    def evaluate_with_pdf(self, wo, wi) -> BSDFResponse:
        """Sum of lobes + probability-weighted pdf (DefaultShading.h:191-215)."""
        frontside = (wo[..., 2] > _MIN_COS) & (wi[..., 2] > _MIN_COS)
        d = oren_nayar.evaluate_with_pdf(self.diffuse_tint, self.roughness, wo, wi)
        s = ggx.r_evaluate_with_pdf(self.specular_alpha, self.specularity, wo, wi)
        c = ggx.r_evaluate_with_pdf(self.coat_alpha, COAT_SPECULARITY, wo, wi)
        reflectance = (d.reflectance
                       + s.reflectance * self.specular_scale[..., None]
                       + c.reflectance * self.coat_scale[..., None])
        pdf = (d.pdf * self.diffuse_probability
               + s.pdf * self.specular_probability
               + c.pdf * self.coat_probability)
        return BSDFResponse(
            reflectance=jnp.where(frontside[..., None], reflectance, 0.0),
            pdf=jnp.where(frontside, pdf, 0.0))

    def sample(self, wo, u3) -> BSDFSample:
        """Pick a lobe ∝ rho, sample it, add the other lobes' f and pdf
        (DefaultShading.h:218-280) — branch-free lobe select."""
        pick = u3[..., 2]
        sample_coat = pick < self.coat_probability
        sample_specular = (~sample_coat
                           & (pick < self.coat_probability + self.specular_probability))
        sample_diffuse = ~sample_coat & ~sample_specular

        u2 = u3[..., :2]
        s_dif = oren_nayar.sample(self.diffuse_tint, self.roughness, wo, u2)
        s_spec = ggx.r_sample(self.specular_alpha, self.specularity, wo, u2)
        s_coat = ggx.r_sample(self.coat_alpha, COAT_SPECULARITY, wo, u2)

        direction = jnp.where(
            sample_coat[..., None], s_coat.direction,
            jnp.where(sample_specular[..., None], s_spec.direction,
                      s_dif.direction))

        # Evaluate ALL lobes at the chosen direction (the reference's
        # "compute contribution of the components not sampled", which its
        # own evaluate already does for every lobe).
        resp = self.evaluate_with_pdf(wo, direction)
        frontside = wo[..., 2] > _MIN_COS
        pdf = jnp.where(frontside, resp.pdf, 0.0)
        reflectance = resp.reflectance

        # Smooth specular/coat lobes are delta mirrors: keep the lobe's own
        # delta sample (reference: early-out on invalid_or_delta_dirac).
        delta_spec = sample_specular & s_spec.is_delta
        delta_coat = sample_coat & s_coat.is_delta
        is_delta = delta_spec | delta_coat
        delta_f = jnp.where(
            delta_spec[..., None],
            s_spec.reflectance * self.specular_scale[..., None],
            s_coat.reflectance * self.coat_scale[..., None])
        delta_pdf = jnp.where(delta_spec, self.specular_probability,
                              self.coat_probability)
        pdf = jnp.where(is_delta, delta_pdf, pdf)
        reflectance = jnp.where(is_delta[..., None], delta_f, reflectance)
        return BSDFSample(
            direction=direction,
            pdf=pdf,
            is_delta=is_delta & frontside,
            reflectance=reflectance)

    # -- rho ----------------------------------------------------------------

    def rho(self, abs_cos_theta):
        """Directional-hemispherical reflectance (albedo AOV)."""
        return (self.diffuse_rho(abs_cos_theta)
                + self.specular_rho(abs_cos_theta)
                + self.coat_rho(abs_cos_theta)[..., None])

    def diffuse_rho(self, abs_cos_theta):
        return self.diffuse_tint

    def specular_rho(self, abs_cos_theta):
        base = sample_ggx_with_fresnel_rho(abs_cos_theta, self.roughness)
        full = sample_ggx_rho(abs_cos_theta, self.roughness)
        return (lerp(base[..., None], full[..., None], self.specularity)
                * self.specular_scale[..., None])

    def coat_rho(self, abs_cos_theta):
        coat_roughness = ggx.roughness_from_alpha(jnp.maximum(self.coat_alpha, 0.0))
        base = sample_ggx_with_fresnel_rho(abs_cos_theta, coat_roughness)
        full = sample_ggx_rho(abs_cos_theta, coat_roughness)
        return lerp(base, full, COAT_SPECULARITY) * self.coat_scale
