"""Batched primary-ray generation (JAX).

Reproduces the reference CPU camera semantics (core/camera.py:41-72
generate_ray): sensor plane at ``focal_dist`` along -z in camera space,
``sensor_height = tan(fov/2) * focal_dist``, square-aperture jitter on the
ray origin, and the row-vector world transform ``homogeneous(v) @ iview``.
(The Taichi twin's aperture bug — scaling the lens jitter by focal distance,
camera_taichi.py:56-57 — is intentionally NOT reproduced; SURVEY §2.19 says
to follow the CPU camera.)
"""

from __future__ import annotations

import jax.numpy as jnp

from pyrenderer_tpu import rng
from pyrenderer_tpu.scene.types import Camera


def generate_rays(camera: Camera, pixel_x, pixel_y, sample_id, seed: int,
                  strata: int = 0):
    """Primary rays for pixel coords (x right, y up-from-bottom).

    pixel_x, pixel_y: (...,) int32; sample_id: scalar or (...,) int32.
    strata > 1 enables stratified (jittered-grid) pixel sampling over a
    strata x strata grid walked by sample_id (the capability of reference
    taichi_ref.py:437-454; Tungsten's stratified_sampler flag).
    Returns (ro, rd): (..., 3) arrays in the camera's dtype.
    """
    w, h = camera.resolution
    dtype = camera.iview.dtype
    pixel_id = (pixel_y * w + pixel_x).astype(jnp.uint32)

    jx, jy = rng.uniform2(seed, pixel_id, sample_id, rng.CAMERA_BOUNCE, rng.U_PIXEL_X, dtype)
    if strata > 1:
        stratum = jnp.asarray(sample_id, jnp.uint32) % (strata * strata)
        sx = (stratum % strata).astype(dtype)
        sy = (stratum // strata).astype(dtype)
        jx = (sx + jx) / strata
        jy = (sy + jy) / strata
    u = (pixel_x.astype(dtype) + jx) / w
    v = (pixel_y.astype(dtype) + jy) / h

    fov = camera.fov_deg * (jnp.pi / 180.0)
    sensor_h = jnp.tan(fov / 2) * camera.focal_dist
    sensor_w = sensor_h * (w / h)

    cx = u - 0.5
    cy = v - 0.5
    d_cam = jnp.stack(
        [
            cx * sensor_w * 2.0,
            cy * sensor_h * 2.0,
            -camera.focal_dist * jnp.ones_like(cx),
        ],
        axis=-1,
    )

    lx, ly = rng.uniform2(seed, pixel_id, sample_id, rng.CAMERA_BOUNCE, rng.U_LENS_X, dtype)
    ap = camera.aperture
    o_cam = jnp.stack(
        [
            jnp.where(ap > 0, ap * lx - ap / 2, 0.0),
            jnp.where(ap > 0, ap * ly - ap / 2, 0.0),
            jnp.zeros_like(lx),
        ],
        axis=-1,
    )

    rot = camera.iview[:3, :3]  # row-vector: world = cam_vec @ iview
    trans = camera.iview[3, :3]
    rd = (d_cam - o_cam) @ rot
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = o_cam @ rot + trans
    return ro, rd
