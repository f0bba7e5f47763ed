"""Pallas TPU kernel: fused wavefront ray-triangle closest-hit.

The pure-XLA paths (core/intersect.py) materialize (N_rays, N_tris)
intermediates in HBM — at 1M rays x 36 tris that is GBs of traffic and
~33 ms/query on a v5e. This kernel is the TPU-native equivalent of the
reference's innermost loop (reference mathematics/intersection_taichi.py:69
ray_triangle_hit inside shapes.py:80-90 per-face scan): triangle data sits
in SMEM as scalars, rays stream through VMEM in (BM, 128) tiles, and the
running (t, tri) minimum lives in registers — HBM sees only the ray inputs
and the per-ray outputs.

Layout: component-planes. Rays arrive as six (M, 128) float32 planes
(ox, oy, oz, dx, dy, dz) where N = M * 128 — the natural VPU tiling, versus
the (N, 3) array-of-structs layout that wastes 125 of 128 lanes.

Accept test and strict-less-than closest update reproduce the reference
semantics (ties resolve to the lowest face index).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrenderer_tpu.kernels import vma

LANES = 128
DEF_BM = 128          # sublane rows per grid step (256 blows the 16M VMEM
                      # scoped-stack limit: the unrolled triangle loop's
                      # independent temporaries all stay live)
UNROLL_T = 64         # unroll the triangle loop up to this many triangles
MISS_T = 3.0e38


def _mt_test(tri, ti, ox, oy, oz, dx, dy, dz, t0, t1):
    """One scalar-triangle Möller–Trumbore test against a ray tile.

    tri: (9, T) SMEM ref rows [v0x v0y v0z e1x e1y e1z e2x e2y e2z].
    Returns (ok, t) for the tile.
    """
    v0x, v0y, v0z = tri[0, ti], tri[1, ti], tri[2, ti]
    e1x, e1y, e1z = tri[3, ti], tri[4, ti], tri[5, ti]
    e2x, e2y, e2z = tri[6, ti], tri[7, ti], tri[8, ti]

    # c = cross(e1, d)
    cx = e1y * dz - e1z * dy
    cy = e1z * dx - e1x * dz
    cz = e1x * dy - e1y * dx
    det = cx * e2x + cy * e2y + cz * e2z
    inv = 1.0 / jnp.where(det == 0, 1.0, det)

    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    # q = cross(s, e2)
    qx = sy * e2z - sz * e2y
    qy = sz * e2x - sx * e2z
    qz = sx * e2y - sy * e2x

    t = -inv * (qx * e1x + qy * e1y + qz * e1z)
    u = -inv * (qx * dx + qy * dy + qz * dz)
    v = inv * (cx * sx + cy * sy + cz * sz)

    ok = (
        (jnp.abs(det) > 0)
        & (t > t0)
        & (t < t1)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (1.0 - u - v >= 0.0)
    )
    return ok, t


def _closest_kernel(n_tris, t0, tri_smem, ox, oy, oz, dx, dy, dz, t1, t_out, tri_out):
    shape = ox.shape
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    t1v = t1[...]

    t_best = jnp.full(shape, MISS_T, jnp.float32)
    tri_best = jnp.full(shape, -1, jnp.int32)

    if n_tris <= UNROLL_T:
        for ti in range(n_tris):
            ok, t = _mt_test(tri_smem, ti, oxv, oyv, ozv, dxv, dyv, dzv, t0, t1v)
            better = ok & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, ti, tri_best)
    else:
        def body(ti, carry):
            t_best, tri_best = carry
            ok, t = _mt_test(tri_smem, ti, oxv, oyv, ozv, dxv, dyv, dzv, t0, t1v)
            better = ok & (t < t_best)
            return (
                jnp.where(better, t, t_best),
                jnp.where(better, ti, tri_best),
            )

        t_best, tri_best = jax.lax.fori_loop(0, n_tris, body, (t_best, tri_best))

    t_out[...] = t_best
    tri_out[...] = tri_best


def _anyhit_kernel(n_tris, t0, tri_smem, ox, oy, oz, dx, dy, dz, t1, hit_out):
    shape = ox.shape
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    t1v = t1[...]

    hit = jnp.zeros(shape, jnp.int32)
    if n_tris <= UNROLL_T:
        for ti in range(n_tris):
            ok, _ = _mt_test(tri_smem, ti, oxv, oyv, ozv, dxv, dyv, dzv, t0, t1v)
            hit = hit | ok.astype(jnp.int32)
    else:
        def body(ti, hit):
            ok, _ = _mt_test(tri_smem, ti, oxv, oyv, ozv, dxv, dyv, dzv, t0, t1v)
            return hit | ok.astype(jnp.int32)

        hit = jax.lax.fori_loop(0, n_tris, body, hit)
    hit_out[...] = hit


@partial(jax.jit, static_argnames=("t0", "block_m", "interpret"))
def anyhit_planes(tri_table, ox, oy, oz, dx, dy, dz, t1, t0=1e-5, block_m=DEF_BM, interpret=False):
    m = ox.shape[0]
    n_tris = tri_table.shape[1]
    bm = min(block_m, m)
    grid = (pl.cdiv(m, bm),)
    ray_spec = pl.BlockSpec((bm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v = vma.args_vma(ox, oy, oz, dx, dy, dz, t1)
    tri_table = vma.promote(tri_table, v)
    return pl.pallas_call(
        partial(_anyhit_kernel, n_tris, t0),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=pl.BlockSpec((bm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=vma.struct((m, LANES), jnp.int32, v),
        interpret=interpret,
    )(tri_table, ox, oy, oz, dx, dy, dz, t1)


def pack_triangles(vertices, faces):
    """(9, T) float32 triangle table [v0 | e1 | e2] for the SMEM operand."""
    v0 = vertices[faces[:, 0]]
    e1 = vertices[faces[:, 1]] - v0
    e2 = vertices[faces[:, 2]] - v0
    return jnp.concatenate([v0.T, e1.T, e2.T], axis=0).astype(jnp.float32)


def _plane(x, m):
    return x.reshape(m, LANES)


@partial(jax.jit, static_argnames=("t0", "block_m", "interpret"))
def closest_hit_planes(
    tri_table, ox, oy, oz, dx, dy, dz, t1, t0=1e-5, block_m=DEF_BM, interpret=False
):
    """Closest hit on component-plane rays. All ray planes (M, 128) f32;
    t1 per-ray. Returns (t (M,128), tri (M,128) int32, tri == -1 on miss)."""
    m = ox.shape[0]
    n_tris = tri_table.shape[1]
    bm = min(block_m, m)
    grid = (pl.cdiv(m, bm),)
    ray_spec = pl.BlockSpec((bm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = partial(_closest_kernel, n_tris, t0)
    # shard_map(check_vma) support: outputs inherit the rays' varying axes,
    # and the replicated triangle table is promoted to match (kernels/vma.py)
    v = vma.args_vma(ox, oy, oz, dx, dy, dz, t1)
    tri_table = vma.promote(tri_table, v)
    t_best, tri_best = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri_table (9, T)
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,                                # t1
        ],
        out_specs=[
            pl.BlockSpec((bm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            vma.struct((m, LANES), jnp.float32, v),
            vma.struct((m, LANES), jnp.int32, v),
        ],
        interpret=interpret,
    )(tri_table, ox, oy, oz, dx, dy, dz, t1)
    return t_best, tri_best


def _split_rays(ro, rd):
    """(N, 3) pairs -> six padded (M, 128) planes + original N."""
    n = ro.shape[0]
    m = pl.cdiv(n, LANES)
    pad = m * LANES - n
    if pad:
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
    planes = [
        _plane(ro[:, 0], m), _plane(ro[:, 1], m), _plane(ro[:, 2], m),
        _plane(rd[:, 0], m), _plane(rd[:, 1], m), _plane(rd[:, 2], m),
    ]
    return planes, n, m


def closest_hit(tri_table, ro, rd, t0, t1, interpret=False):
    """Drop-in wavefront closest hit: ro, rd (N, 3); t1 scalar or (N,).

    Returns (hit (N,) bool, t (N,) f32, tri (N,) int32) matching
    core/intersect.py's contract. The selection is discrete — callers
    re-evaluate hit geometry differentiably (integrator does this), so the
    inputs are detached here: pallas_call has no autodiff rule, and without
    the stop_gradient a grad through the integrator would fail as soon as
    bounce>0 rays (which carry tangents) reach the kernel.
    """
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    (planes, n, m) = _split_rays(ro, rd)
    if jnp.ndim(t1) == 0:
        t1p = jnp.full((m, LANES), t1, jnp.float32)
    else:
        pad = m * LANES - n
        t1p = _plane(jnp.pad(t1, (0, pad)) if pad else t1, m)
    t_best, tri_best = closest_hit_planes(
        tri_table, *planes, t1p, t0=float(t0), interpret=interpret
    )
    t_flat = t_best.reshape(-1)[:n]
    tri_flat = tri_best.reshape(-1)[:n]
    hit = tri_flat >= 0
    return hit, jnp.where(hit, t_flat, 0.0), tri_flat


def occluded(tri_table, ro, rd, t0, t1, interpret=False):
    """Any-hit shadow query (t1 per-ray or scalar) — no closest-hit argmin.
    Inputs detached (see closest_hit)."""
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    (planes, n, m) = _split_rays(ro, rd)
    if jnp.ndim(t1) == 0:
        t1p = jnp.full((m, LANES), t1, jnp.float32)
    else:
        pad = m * LANES - n
        t1p = _plane(jnp.pad(t1, (0, pad)) if pad else t1, m)
    hit = anyhit_planes(tri_table, *planes, t1p, t0=float(t0), interpret=interpret)
    return hit.reshape(-1)[:n] > 0
