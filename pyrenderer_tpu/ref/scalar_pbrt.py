"""Scalar NumPy oracle for the "pbrt" estimator (core/integrator_pbrt.py).

Independent implementation sharing only the RNG twin; per-ray it vectorizes
only over triangles. RNG slot usage must mirror integrator_pbrt.py's
docstring exactly.
"""

from __future__ import annotations

from math import pi, sqrt

import numpy as np

from pyrenderer_tpu.ref.scalar import (
    INV_PI,
    U_BSDF_0,
    U_BSDF_2,
    U_RR,
    _normalize,
    _uni,
    _uni2,
    cosine_sample_hemisphere,
    face_normal,
    intersect_ray,
    occluded,
    rotate_z_to,
    sample_light_point,
)
from pyrenderer_tpu.scene.types import MAT_DIELECTRIC, MAT_LAMBERT, MAT_METAL


def _light_area_pdf(scene, face):
    """1 / (L * nf * area) for a light face (0 otherwise)."""
    n_lights = scene.light_faces.shape[0]
    for li in range(n_lights):
        nf = int(scene.light_nfaces[li])
        if face in set(int(x) for x in scene.light_faces[li][:nf]):
            f = scene.faces[face]
            e1 = scene.vertices[f[1]] - scene.vertices[f[0]]
            e2 = scene.vertices[f[2]] - scene.vertices[f[0]]
            area = 0.5 * np.linalg.norm(np.cross(e1, e2))
            return 1.0 / (n_lights * nf * max(area, 1e-12))
    return 0.0


def _power_heuristic(pf, pg):
    f2, g2 = pf * pf, pg * pg
    return f2 / max(f2 + g2, 1e-20)


def _reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def _refract(uv, n, eta):
    cos_theta = min(np.dot(-uv, n), 1.0)
    r_perp = eta * (uv + cos_theta * n)
    par = -sqrt(abs(1.0 - np.dot(r_perp, r_perp)))
    return r_perp + par * n


def _schlick(cosine, ref_idx):
    r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def _point_in_unit_sphere(u1, u2, u3):
    cos_t = 1.0 - 2.0 * u1
    sin_t = sqrt(max(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * pi * u2
    r = np.cbrt(u3)
    return np.array([r * sin_t * np.cos(phi), r * sin_t * np.sin(phi), r * cos_t])


def trace_pbrt(scene, cfg, ro, rd, pixel_id, sample, seed, dtype):
    radiance = np.zeros(3, dtype)
    beta = np.ones(3, dtype)
    prev_pdf = 1.0
    prev_spec = False

    for bounce in range(cfg.max_bounces):
        hit, t, tri = intersect_ray(scene, ro, rd, cfg.t_min, cfg.t_max)
        if not hit:
            break
        f = scene.faces[tri]
        mat = int(scene.face_material[tri])
        emissive = scene.emissive[mat] > 0
        sided = scene.sided[mat] > 0
        mat_type = int(scene.mat_type[mat])
        albedo = scene.albedo[mat].astype(dtype)
        n_geo = face_normal(scene, tri, dtype)
        nrm = n_geo
        if (not sided) and np.dot(nrm, -rd) < 0:
            nrm = -nrm
        p = ro + t * rd

        if emissive:
            cos_l = np.dot(-rd, nrm)
            if cos_l > 0:
                pdf_a = _light_area_pdf(scene, tri)
                pdf_light_sa = pdf_a * max(t * t, 1e-12) / max(cos_l, 1e-6)
                if bounce == 0 or prev_spec:
                    w = 1.0
                else:
                    w = _power_heuristic(prev_pdf, pdf_light_sa)
                radiance = radiance + scene.emission[mat].astype(dtype) * beta * w
            break

        is_lambert = mat_type == MAT_LAMBERT
        is_metal = mat_type == MAT_METAL
        is_diel = mat_type == MAT_DIELECTRIC

        # NEE from diffuse vertices
        p2, n2, light_mat = sample_light_point(scene, pixel_id, sample, bounce, seed, dtype)
        if is_lambert:
            to_light = p2 - p
            dist_sq = max(float(np.dot(to_light, to_light)), 1e-12)
            dist = sqrt(dist_sq)
            wl = to_light / dist
            cos_surf = np.dot(nrm, wl)
            cos_light = np.dot(n2, -wl)
            if cos_surf > 0 and cos_light > 0:
                if not occluded(scene, p, wl, cfg.t_min, dist * (1.0 - cfg.shadow_eps)):
                    # pdf_a of the SAMPLED face (recover it from the sampler's
                    # face choice — recompute identically)
                    n_lights = scene.light_faces.shape[0]
                    if n_lights > 1:
                        up = _uni(seed, pixel_id, sample, bounce, 7, dtype)  # U_LIGHT_PRIM
                        li = min(int(up * n_lights), n_lights - 1)
                    else:
                        li = 0
                    nf = int(scene.light_nfaces[li])
                    uf = _uni(seed, pixel_id, sample, bounce, 8, dtype)  # U_LIGHT_FACE
                    fi = min(int(uf * nf), nf - 1)
                    lf = int(scene.light_faces[li, fi])
                    pdf_a = _light_area_pdf(scene, lf)
                    pdf_nee_sa = pdf_a * dist_sq / max(cos_light, 1e-6)
                    pdf_bsdf_here = max(0.0, cos_surf) * INV_PI
                    w_nee = _power_heuristic(pdf_nee_sa, pdf_bsdf_here)
                    em = scene.emission[light_mat].astype(dtype)
                    f_val = albedo * INV_PI
                    radiance = radiance + beta * f_val * em * (
                        w_nee * cos_surf / max(pdf_nee_sa, 1e-12)
                    )

        # BSDF sample
        u1, u2 = _uni2(seed, pixel_id, sample, bounce, U_BSDF_0, dtype)
        u3 = _uni(seed, pixel_id, sample, bounce, U_BSDF_2, dtype)
        if is_lambert:
            wi = rotate_z_to(nrm, cosine_sample_hemisphere(u1, u2)).astype(dtype)
            pdf_l = abs(np.dot(nrm, wi)) * INV_PI
            beta = beta * albedo
            prev_pdf, prev_spec = pdf_l, False
        elif is_metal:
            refl = _reflect(rd, nrm)
            wi = refl + scene.roughness[mat] * _point_in_unit_sphere(u1, u2, u3)
            norm = np.linalg.norm(wi)
            wi = wi / (norm if norm != 0 else 1.0)
            if np.dot(wi, nrm) <= 0:
                break
            beta = beta * albedo
            prev_pdf, prev_spec = 1.0, True
        else:  # dielectric
            front = np.dot(rd, n_geo) < 0
            n_eff = n_geo if front else -n_geo
            eta = (1.0 / scene.ior[mat]) if front else scene.ior[mat]
            cos_theta = min(np.dot(-rd, n_eff), 1.0)
            sin_theta = sqrt(max(0.0, 1.0 - cos_theta * cos_theta))
            if eta * sin_theta > 1.0 or u3 < _schlick(cos_theta, eta):
                wi = _reflect(rd, n_eff)
            else:
                wi = _refract(rd, n_eff, eta)
            wi = _normalize(wi)
            prev_pdf, prev_spec = 1.0, True

        # russian roulette
        u_rr = _uni(seed, pixel_id, sample, bounce, U_RR, dtype)
        if bounce >= cfg.russian_roulette_start:
            p_cont = float(np.clip(np.max(beta), 0.05, 1.0))
            if u_rr >= p_cont:
                break
            beta = beta / p_cont

        ro, rd = p, wi
    return radiance
