"""Batched BSDF sampling/evaluation for the "pbrt" estimator.

Material algorithms follow the reference's three material families:
  - lambert: cosine-hemisphere scatter, f = albedo/pi, pdf = cos/pi
    (reference core/bsdf.py:19 BSDFLambertian, taichi_ref.py:421-427);
  - metal: mirror reflection + roughness * point-in-unit-sphere fuzz,
    absorbed if the fuzzed direction leaves the hemisphere (reference
    core/bsdf_taichi.py:46-59 Metal.scatter, taichi_ref.py:416-419);
  - dielectric: Snell refraction with Schlick-probability reflection,
    total internal reflection handled (reference core/bsdf_taichi.py:62-86
    Dielectric.scatter, taichi_ref.py:401-434 glass).

All functions are batched over (N, ...) and draw no randomness themselves —
uniforms come in as arguments so the NumPy oracle (ref/scalar_pbrt.py) can
mirror the exact stream.
"""

from __future__ import annotations

import jax.numpy as jnp

from pyrenderer_tpu.core import sampling
from pyrenderer_tpu.core.sampling import INV_PI, PI


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def reflect(v, n):
    """Mirror v about the plane of normal n (v points toward the surface)."""
    return v - 2.0 * _dot(v, n)[..., None] * n


def refract(uv, n, eta_ratio):
    """Snell refraction of unit vector uv about n (reference
    core/bsdf_taichi.py:18-24)."""
    cos_theta = jnp.minimum(_dot(-uv, n), 1.0)
    r_out_perp = eta_ratio[..., None] * (uv + cos_theta[..., None] * n)
    par_len = -sampling.safe_sqrt(jnp.abs(1.0 - _dot(r_out_perp, r_out_perp)))
    return r_out_perp + par_len[..., None] * n


def schlick(cosine, ref_idx):
    """Schlick's reflectance approximation (reference core/bsdf_taichi.py:7,
    taichi_ref.py:401)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def point_in_unit_sphere(u1, u2, u3):
    """Uniform point in the unit ball: direction from (u1, u2), radius
    cbrt(u3) (the metal-fuzz perturbation, reference vec3_taichi.py random
    sphere point)."""
    cos_t = 1.0 - 2.0 * u1
    sin_t = sampling.safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * PI * u2
    r = jnp.cbrt(u3)
    return jnp.stack(
        [r * sin_t * jnp.cos(phi), r * sin_t * jnp.sin(phi), r * cos_t], axis=-1
    )


def lambert_sample(nrm, u1, u2):
    """Cosine-weighted wi in the frame of nrm; returns (wi, pdf)."""
    wi_local = sampling.cosine_sample_hemisphere(u1, u2)
    wi = sampling.rotate_z_to(nrm, wi_local)
    pdf = jnp.abs(_dot(nrm, wi)) * INV_PI
    return wi, pdf


def lambert_pdf(nrm, wi):
    return jnp.maximum(0.0, _dot(nrm, wi)) * INV_PI


def metal_sample(rd, nrm, roughness, u1, u2, u3):
    """Fuzzy mirror; returns (wi, valid). Throughput scale = albedo when
    valid, 0 otherwise."""
    refl = reflect(rd, nrm)
    fuzz = point_in_unit_sphere(u1, u2, u3)
    wi = refl + roughness[..., None] * fuzz
    wi = sampling.safe_normalize(wi)
    valid = _dot(wi, nrm) > 0
    return wi, valid


def dielectric_sample(rd, nrm, ior, u_choice):
    """Glass: refract unless total-internal-reflection or the Schlick draw
    chooses reflection. rd unit, nrm the outward geometric normal (pre-flip).
    Returns wi (unit)."""
    front = _dot(rd, nrm) < 0
    n_eff = jnp.where(front[..., None], nrm, -nrm)
    eta = jnp.where(front, 1.0 / ior, ior)
    cos_theta = jnp.minimum(_dot(-rd, n_eff), 1.0)
    sin_theta = sampling.safe_sqrt(1.0 - cos_theta * cos_theta)
    cannot_refract = eta * sin_theta > 1.0
    reflect_prob = schlick(cos_theta, eta)
    do_reflect = cannot_refract | (u_choice < reflect_prob)
    wi_reflect = reflect(rd, n_eff)
    wi_refract = refract(rd, n_eff, eta)
    wi = jnp.where(do_reflect[..., None], wi_reflect, wi_refract)
    return sampling.safe_normalize(wi)


def power_heuristic(pf, pg):
    """Two-sample power heuristic (reference core/tracing.py:18)."""
    f2 = pf * pf
    g2 = pg * pg
    return f2 / jnp.maximum(f2 + g2, 1e-20)
