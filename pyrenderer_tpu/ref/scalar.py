"""Scalar NumPy reference integrator — the matched-seed CPU oracle.

The reference repo's CPU integrator was deleted (its main.py:5 imports a
`path_tracing` that no longer exists — SURVEY §0), so this module *is* the
"CPU ref via core/tracing.py" that BASELINE config 1 demands: a from-scratch
NumPy implementation of the same estimator semantics as
core/integrator.py's "reference" mode, sharing zero code with the JAX path
(only the RNG twin ref/rng_np.py, which is itself independent NumPy).

Per-ray it vectorizes only over triangles (like the reference's Numba batch
kernel, mathematics/intersection.py:68-82); everything else is scalar
Python/NumPy, deliberately simple.
"""

from __future__ import annotations

from math import pi, sqrt, tan

import numpy as np

from pyrenderer_tpu.ref import rng_np

INV_PI = 1.0 / pi
_AXIS_EPS = 1e-6
REF_LIGHT_COLOR = np.array([0.9, 0.85, 0.7])

U_PIXEL_X, U_PIXEL_Y, U_LENS_X, U_LENS_Y = 0, 1, 2, 3
U_BSDF_0, U_BSDF_1, U_BSDF_2 = 4, 5, 6
U_LIGHT_PRIM, U_LIGHT_FACE, U_LIGHT_U, U_LIGHT_V, U_RR = 7, 8, 9, 10, 11
CAMERA_BOUNCE = 255


def _normalize(v):
    n = np.sqrt(np.sum(v * v))
    return v / (n if n != 0 else 1.0)


def _uni(seed, pixel, sample, bounce, use, dtype):
    return rng_np.uniform(seed, pixel, sample, bounce, use, dtype=dtype)


def _uni2(seed, pixel, sample, bounce, use, dtype):
    return rng_np.uniform2(seed, pixel, sample, bounce, use, dtype=dtype)


def generate_ray(camera, x, y, sample, seed, dtype, strata=0):
    w, h = camera.resolution
    pixel_id = y * w + x
    jx, jy = _uni2(seed, pixel_id, sample, CAMERA_BOUNCE, U_PIXEL_X, dtype)
    if strata > 1:
        stratum = int(sample) % (strata * strata)
        jx = ((stratum % strata) + jx) / strata
        jy = ((stratum // strata) + jy) / strata
    u = (dtype(x) + jx) / w
    v = (dtype(y) + jy) / h

    fov = float(camera.fov_deg) * pi / 180.0
    focal = dtype(camera.focal_dist)
    sensor_h = dtype(tan(fov / 2)) * focal
    sensor_w = sensor_h * dtype(w / h)

    d_cam = np.array([(u - dtype(0.5)) * sensor_w * 2, (v - dtype(0.5)) * sensor_h * 2, -focal], dtype)
    ap = dtype(camera.aperture)
    if ap > 0:
        lx, ly = _uni2(seed, pixel_id, sample, CAMERA_BOUNCE, U_LENS_X, dtype)
        o_cam = np.array([ap * lx - ap / 2, ap * ly - ap / 2, 0.0], dtype)
    else:
        o_cam = np.zeros(3, dtype)

    rot = np.asarray(camera.iview, dtype)[:3, :3]
    trans = np.asarray(camera.iview, dtype)[3, :3]
    rd = _normalize((d_cam - o_cam) @ rot)
    ro = o_cam @ rot + trans
    return ro.astype(dtype), rd.astype(dtype)


def intersect_ray(scene, ro, rd, t0, t1):
    """Closest hit, vectorized over triangles; reference op order
    (intersection_taichi.py:69-91). Returns (hit, t, tri)."""
    v = scene.vertices
    f = scene.faces
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    c_e1_d = np.cross(e1, rd[None, :])
    det = np.sum(c_e1_d * e2, axis=-1)
    safe_det = np.where(det == 0, 1.0, det)
    s = ro[None, :] - v0
    c_s_e2 = np.cross(s, e2)
    inv = 1.0 / safe_det
    t = -inv * np.sum(c_s_e2 * e1, axis=-1)
    u = -inv * np.sum(c_s_e2 * rd[None, :], axis=-1)
    w = inv * np.sum(c_e1_d * s, axis=-1)
    valid = (
        (np.abs(det) > 0)
        & (t > t0)
        & (t < t1)
        & (u >= 0)
        & (u <= 1)
        & (w >= 0)
        & (1.0 - u - w >= 0)
    )
    t_masked = np.where(valid, t, np.inf)
    tri = int(np.argmin(t_masked))
    t_hit = t_masked[tri]
    if not np.isfinite(t_hit):
        return False, 0.0, 0
    return True, t_hit, tri


def occluded(scene, ro, rd, t0, t1):
    hit, _, _ = intersect_ray(scene, ro, rd, t0, t1)
    return hit


def face_normal(scene, tri, dtype):
    f = scene.faces[tri]
    v0 = scene.vertices[f[0]].astype(dtype)
    e1 = scene.vertices[f[1]].astype(dtype) - v0
    e2 = scene.vertices[f[2]].astype(dtype) - v0
    return dtype(scene.normal_sign[tri]) * _normalize(np.cross(e1, e2))


def concentric_sample_disk(u1, u2):
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    if ox == 0 and oy == 0:
        return 0.0, 0.0
    if abs(ox) > abs(oy):
        r = ox
        theta = (pi / 4) * (oy / ox)
    else:
        r = oy
        theta = (pi / 2) - (pi / 4) * (ox / oy)
    return r * np.cos(theta), r * np.sin(theta)


def cosine_sample_hemisphere(u1, u2):
    dx, dy = concentric_sample_disk(u1, u2)
    z = sqrt(max(0.0, 1.0 - dx * dx - dy * dy))
    return np.array([dx, dy, z])


def rotate_z_to(n, local):
    ny = n[1]
    if abs(ny - 1.0) < _AXIS_EPS:
        x_hat = np.array([1.0, 0, 0])
        z_hat = np.array([0, 0, 1.0])
        n_frame = np.array([0, 1.0, 0])
    elif abs(ny + 1.0) < _AXIS_EPS:
        x_hat = np.array([1.0, 0, 0])
        z_hat = np.array([0, 0, 1.0])
        n_frame = np.array([0, -1.0, 0])
    else:
        x_hat = _normalize(np.array([-n[2], 0.0, n[0]]))
        z_hat = _normalize(np.cross(x_hat, n))
        n_frame = n
    world = local[0] * x_hat + local[1] * z_hat + local[2] * n_frame
    return _normalize(world)


def sample_light_point(scene, pixel_id, sample, bounce, seed, dtype):
    n_lights = scene.light_faces.shape[0]
    if n_lights > 1:
        up = _uni(seed, pixel_id, sample, bounce, U_LIGHT_PRIM, dtype)
        li = min(int(up * n_lights), n_lights - 1)
    else:
        li = 0
    nf = int(scene.light_nfaces[li])
    uf = _uni(seed, pixel_id, sample, bounce, U_LIGHT_FACE, dtype)
    fi = min(int(uf * nf), nf - 1)
    lf = int(scene.light_faces[li, fi])
    f = scene.faces[lf]
    v0 = scene.vertices[f[0]].astype(dtype)
    v1 = scene.vertices[f[1]].astype(dtype)
    v2 = scene.vertices[f[2]].astype(dtype)
    u, v = _uni2(seed, pixel_id, sample, bounce, U_LIGHT_U, dtype)
    su = sqrt(u)
    a = su * (1.0 - v)
    b = su * v
    p2 = a * v0 + b * v1 + (1.0 - a - b) * v2
    n2 = face_normal(scene, lf, dtype)
    return p2, n2, int(scene.face_material[lf])


def trace_reference(scene, cfg, ro, rd, pixel_id, sample, seed, dtype):
    radiance = np.zeros(3, dtype)
    beta = np.ones(3, dtype)
    light_color = REF_LIGHT_COLOR.astype(dtype)

    for bounce in range(cfg.max_bounces):
        hit, t, tri = intersect_ray(scene, ro, rd, cfg.t_min, cfg.t_max)
        if not hit:
            break
        nrm = face_normal(scene, tri, dtype)
        mat = int(scene.face_material[tri])
        emissive = scene.emissive[mat] > 0
        sided = scene.sided[mat] > 0
        if (not sided) and np.dot(nrm, -rd) < 0:
            nrm = -nrm
        p = ro + t * rd

        if emissive:
            d1 = np.dot(-rd, nrm)
            if d1 > 0:
                weight = 1.0 if bounce == 0 else d1
                radiance = radiance + light_color * beta * weight
            break

        u1, u2 = _uni2(seed, pixel_id, sample, bounce, U_BSDF_0, dtype)
        wi = rotate_z_to(nrm, cosine_sample_hemisphere(u1, u2)).astype(dtype)
        cos_wi = np.dot(nrm, wi)
        pdf = abs(cos_wi) * INV_PI
        albedo = scene.albedo[mat].astype(dtype)
        if cos_wi != 0:
            new_beta = albedo * (max(0.0, cos_wi) / pdf * INV_PI)
        else:
            new_beta = np.zeros(3, dtype)
        beta = beta * new_beta

        p2, n2, light_mat = sample_light_point(scene, pixel_id, sample, bounce, seed, dtype)
        to_light = p2 - p
        dist_sq = max(float(np.dot(to_light, to_light)), 1e-12)
        dist = sqrt(dist_sq)
        w = to_light / dist
        if not occluded(scene, p, w, cfg.t_min, dist * (1.0 - cfg.shadow_eps)):
            dot1 = np.dot(nrm, w)
            dot2 = np.dot(n2, -w)
            if dot1 > 0 and dot2 > 0:
                em = scene.albedo[light_mat].astype(dtype)
                radiance = radiance + beta * em * (dot1 * dot2 / dist_sq)

        ro, rd = p, wi
    return radiance


def render_image(scene, camera, cfg, dtype=np.float64, pixels=None):
    """HDR mean-radiance image (H, W, 3), row 0 at the top.

    `pixels`: optional list of (x, y) to render a subset (y up from bottom);
    unrendered pixels stay 0.
    """
    w, h = camera.resolution
    img = np.zeros((h, w, 3), dtype)
    if pixels is None:
        pixels = [(x, y) for y in range(h) for x in range(w)]
    from math import ceil, sqrt as _sqrt

    strata = int(ceil(_sqrt(cfg.spp))) if getattr(cfg, "stratified", False) else 0
    for x, y in pixels:
        pixel_id = y * w + x
        acc = np.zeros(3, dtype)
        for s in range(cfg.spp):
            ro, rd = generate_ray(camera, x, y, s, cfg.seed, dtype, strata=strata)
            if cfg.estimator == "reference":
                acc += trace_reference(scene, cfg, ro, rd, pixel_id, s, cfg.seed, dtype)
            else:
                from pyrenderer_tpu.ref.scalar_pbrt import trace_pbrt

                acc += trace_pbrt(scene, cfg, ro, rd, pixel_id, s, cfg.seed, dtype)
        img[h - 1 - y, x] = acc / cfg.spp
    return img
