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


def morton_pixel_order(w: int, h: int):
    """Permutation putting flattened row-major pixels into Morton (Z-curve)
    order, and its inverse. NumPy, host-side, computed once per resolution.

    Why: the wavefront backends process rays in 128-ray tiles; in row-major
    order a tile is a 1x128 scanline sliver whose frustum crosses many
    acceleration-structure nodes, while a Morton tile is a ~12x11 screen
    block — the cull masks of kernels/pallas_cluster.py agree far more
    often. Ordering is invisible to the estimator (the RNG is keyed on
    pixel id, not trace order).

    Returns (perm, inv_perm), both (w*h,) int64 with
    flat_morton = flat_row_major[perm] and flat_row_major = flat_morton[inv_perm].
    """
    import numpy as np

    ys, xs = np.mgrid[0:h, 0:w]
    xs = xs.reshape(-1).astype(np.uint64)
    ys = ys.reshape(-1).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    code = (spread(xs) << np.uint64(1)) | spread(ys)
    perm = np.argsort(code, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm, inv
