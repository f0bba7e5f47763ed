"""Pallas TPU kernel: lockstep cluster-sweep ray traversal for large scenes.

Companion to accel/clusters.py (see its docstring for the structure). This
is the TPU-native replacement for a divergent per-ray BVH walk (reference
mathematics/intersection_taichi.py:256-287): instead of each ray chasing
node pointers, a TILE of 128 rays sweeps the supercluster list in lockstep.

Layout and control flow are shaped by three measured TPU costs
(perf/kernelbench.py runs the measurements on the real chip):

  * vector width — every box test keeps RAYS IN LANES, so a slab
    evaluation is a handful of (1,128) / (S,128) / (16,128) ops at full
    VPU width (an early draft kept rays in sublanes, making each slab op
    a (R,1) column that used 1 of 128 lanes — 30x slower end to end);
  * scalar extraction — moving ONE value from a vector register to the
    scalar unit costs ~0.3-0.7 us on Mosaic. All box tests therefore run
    DENSELY up front and the per-box decisions are packed into a few
    int32 BITMASKS (one extraction per 32 boxes);
  * lax.cond — a 16-way unrolled cond chain over the children of every
    visited supercluster (the round-2 design) costs ~0.2-2 us per cond
    AND blows the Mosaic program up quadratically (277 s compiles at
    100k triangles). The sweep now iterates set bits directly with a
    count-trailing-zeros while-loop: one iteration per FLAGGED child,
    zero cost for skipped ones, and the program contains each loop body
    once.

Per 128-ray tile:
  1. dense prepass: slab-test all S superclusters at once ((S_pad,128),
     boxes in sublanes, rays in lanes), reduce over rays, pack visit bits
     into ceil(S/32) int32 scalars. The supercluster rows arrive
     PERMUTED into front-to-back order (sorted outside the kernel by box
     distance from the wavefront's mean origin), so ascending bit rank ==
     near-to-far visit order and an SMEM table maps rank back to the
     original supercluster id;
  2. sweep the set bits of each word near-to-far (ctz loop). A visited
     supercluster slab-tests its 16 child clusters (16,128) against each
     ray's RUNNING per-ray t-bound, packs ONE bitmask, and each flagged
     child runs a dense (128 rays x 128 tris) Moeller-Trumbore at full
     width: rays in SUBLANES here (column forms precomputed outside the
     kernel — no in-kernel transposes of ray data), triangles in lanes
     straight from the packed table.

Closest-hit feedback: per-ray best t lives in column form for the leaf
accept test; after each visit it is transposed (one (128,1)->(1,128)
relayout, vector-unit work, no scalar move) into lane space where the
child culls read it. With front-to-back order this prunes like a BVH's
ordered traversal — per ray, not via a shared scalar cap. The any-hit
kernel instead retires rays as they occlude (column space) and breaks
out of the sweep once the whole tile is decided.

The whole clustered scene is VMEM-resident (tri table (K*16, 128) f32 —
8 KB per 128 triangles plus ~0.5 KB of boxes, ~180k triangles in a 12 MB
budget), so traversal does zero HBM traffic beyond the ray tiles.

Measured on the real v5e chip (perf/RESULTS.md has the full tables):
a full-width leaf costs 0.82 us in a slim loop; per-visit pack-extracts
~0.3-0.7 us (vector->scalar sync); and WAVEFRONT ORDER dominates — the
same kernel spans ~20 us/tile (pixel-ordered) to ~55 us/tile (shuffled)
on terrain100k, with a sorted-shuffled middle of ~45 (absolute rates vary
~2x with facility load day-to-day; ratios are stable). An exact CPU
replay of the sweep's decisions shows a sorted 128-ray tile does ~89 leaf
visits = 0.70 per ray slot versus the 3.34 a ray needs alone — the
lockstep union AMORTIZES 4.8x, and the sort keys are near-optimal among
the designs tested. Hence the coherence sort (sort_keys) is applied per
scene size (RenderConfig.cluster_sort="auto": the ~6 ms/query sort glue
only pays past ~32k triangles), SUB_TILES rays share each grid step, and
per-ray t feedback rides a transpose rather than a scalar extraction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrenderer_tpu.kernels import vma
from pyrenderer_tpu.accel.clusters import (
    GAMMA2_3,
    GROUP,
    LANE_TRIS,
    MISS_T,
    TRI_ROWS,
    ClusterScene,
    slot_to_face,
    sort_keys,
)

RAY_TILE = 128  # rays per sweep tile = VPU lane width
# ray tiles per grid step: per-step DMA/pipeline overhead is ~10 us on the
# chip (measured, perf/kernelbench.py), which WAS the round-2 throughput
# floor at ~1 tile of real work per step; amortizing it 8-fold moves the
# floor to ~1 us. Env knob for the perf harness's A/B only.
SUB_TILES = int(__import__("os").environ.get("PYRENDERER_SUB_TILES", "8"))

# MISS_T with the low 7 mantissa bits cleared — the closest kernel tracks
# t_best in this "masked" domain (see the key-packed leaf reduction), so
# the all-miss initial value must live there too or a full-miss leaf would
# compare as an improvement.
MISS_T_MASKED = float(
    __import__("numpy").int32(
        __import__("numpy").float32(MISS_T).view(__import__("numpy").int32)
        & ~__import__("numpy").int32(127)
    ).view(__import__("numpy").float32)
)


def _ctz_low(low):
    """Index of the single set bit of ``low`` (= word & -word, nonzero).

    31 - clz: Mosaic compiles scalar jax.lax.clz fine (verified on chip —
    perf/kernelbench.py's ctz bench has always used it; the round-3 claim
    that no scalar clz existed was stale). Bit 31 (low == INT_MIN) needs
    no special case: clz(0x80000000) == 0 -> index 31.
    """
    return jnp.int32(31) - jax.lax.clz(low)


def _ray_planes(rays_ref, st):
    """Split sub-tile st of the (8 * SUB, 128) lane-form ray block into
    (1, 128) component rows."""
    r = rays_ref[pl.ds(st * 8, 8), :]
    o = (r[0:1, :], r[1:2, :], r[2:3, :])
    d = (r[3:4, :], r[4:5, :], r[5:6, :])
    t1 = r[6:7, :]
    inv = tuple(1.0 / jnp.where(c == 0, 1e-20, c) for c in d)
    return o, d, inv, t1


def _box_slab(blk, o, inv, t0, t_lim):
    """(B, 128) slab test: boxes in sublanes (cols 0..5 = min|max), rays in
    lanes; t_lim scalar or (1, 128) per-ray. Returns the (B, 128) crossing
    mask. NaN box rows (padding) never cross."""
    lox = (blk[:, 0:1] - o[0]) * inv[0]
    loy = (blk[:, 1:2] - o[1]) * inv[1]
    loz = (blk[:, 2:3] - o[2]) * inv[2]
    hix = (blk[:, 3:4] - o[0]) * inv[0]
    hiy = (blk[:, 4:5] - o[1]) * inv[1]
    hiz = (blk[:, 5:6] - o[2]) * inv[2]
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
        jnp.maximum(jnp.minimum(loz, hiz), t0),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
        jnp.maximum(loz, hiz),
    ) * jnp.float32(1.0 + GAMMA2_3)
    return t_near <= jnp.minimum(t_far, t_lim)


def _pack_bits(mask, bitw, n_groups):
    """(B, 128) bool -> list of n_groups int32 scalars; bit (b % 32) of
    group (b // 32) is set when row b crosses for ANY ray. One scalar
    extraction per 32 boxes instead of one per box."""
    crossed = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True) > 0
    bits = jnp.where(crossed, bitw, 0)                    # (B, 1)
    b = bits.shape[0]
    grp = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) // 32
    return [jnp.sum(jnp.where(grp == g, bits, 0)) for g in range(n_groups)]


def _child_bits(child_ref, s, o, inv, t0, t_lim, bitw16):
    """One int32 scalar with bit c set when child cluster c of supercluster
    s crosses any ray (bounded per-ray by t_lim (1, 128))."""
    blk = child_ref[pl.ds(s * GROUP, GROUP), :]           # (GROUP, 128)
    cmask = _box_slab(blk, o, inv, t0, t_lim)
    crossed = jnp.sum(cmask.astype(jnp.int32), axis=1, keepdims=True) > 0
    return jnp.sum(jnp.where(crossed, bitw16, 0))


def _child_bits2(child_ref, s1, s2, o, inv, t0, t_lim, bitw32):
    """One int32 scalar packing the child-cluster crossing bits of TWO
    superclusters: bits 0..GROUP-1 for s1's children, GROUP..2*GROUP-1 for
    s2's. The vector->scalar pack is the per-visit critical-path sync
    (~0.3-0.7 us measured); peeling two flagged superclusters per loop
    iteration halves how often the sweep pays it. s2 may be the dummy
    all-NaN padding supercluster (ClusterScene.dummy_super) when only one
    flagged supercluster remains — its bits never set."""
    blk1 = child_ref[pl.ds(s1 * GROUP, GROUP), :]         # (GROUP, 128)
    blk2 = child_ref[pl.ds(s2 * GROUP, GROUP), :]
    m1 = _box_slab(blk1, o, inv, t0, t_lim)
    m2 = _box_slab(blk2, o, inv, t0, t_lim)
    crossed = jnp.concatenate(
        [jnp.sum(m1.astype(jnp.int32), axis=1, keepdims=True) > 0,
         jnp.sum(m2.astype(jnp.int32), axis=1, keepdims=True) > 0],
        axis=0,
    )                                                     # (2 * GROUP, 1)
    return jnp.sum(jnp.where(crossed, bitw32, 0))


# Feed the running per-ray t_best back into the child culls (one
# (128,1)->(1,128) relayout per visited supercluster). Module-level so the
# perf harness can A/B it; the relayout pays for itself whenever front-to-
# back order lets near hits prune far superclusters.
_TLANE_REFRESH = True

# Pop TWO flagged superclusters per sweep iteration (one bit-pack extract
# for both) instead of one. Measured on chip (perf/RESULTS.md round 4):
# the halved extract count does NOT pay for the stale second cull — s2 is
# culled with the t bound from BEFORE s1's leaves ran, so on coherent
# tiles where the nearest supercluster resolves every ray, s2 runs its
# full leaves where the single-peel sweep paid only a cull+extract.
# Kept behind a flag for the perf harness; default off.
_PAIR_PEEL = False

# int32 bit pattern of MISS_T_MASKED: a lane key below this encodes a hit
MISS_MASKED_BITS = int(
    __import__("numpy").float32(MISS_T_MASKED).view(__import__("numpy").int32)
)


def _key_min(tm):
    """(R, 128) accepted-t grid -> (R, 1) packed int32 key min over lanes.

    ONE cross-lane reduction instead of min+argmin: t is positive, so its
    f32 bits order like the float; the mantissa's low 7 bits carry the
    winning lane (t loses <= 2^-17 relative precision — the integrator
    re-derives exact t from the hit triangle anyway)."""
    key = jnp.bitwise_or(
        jnp.bitwise_and(
            jax.lax.bitcast_convert_type(tm, jnp.int32), ~jnp.int32(127)
        ),
        jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1),
    )
    return jnp.min(key, axis=1, keepdims=True)


def _leaf_mt_chunk(blk, oc, dc, t0, t_lim):
    """(R rays, 128 tris) Moeller-Trumbore. oc/dc: (R, 1) columns; t_lim
    (R, 1). Returns the (R, 1) key min (see _key_min)."""
    v0x, v0y, v0z = blk[0:1, :], blk[1:2, :], blk[2:3, :]
    e1x, e1y, e1z = blk[3:4, :], blk[4:5, :], blk[5:6, :]
    e2x, e2y, e2z = blk[6:7, :], blk[7:8, :], blk[8:9, :]
    ox, oy, oz = oc
    dx, dy, dz = dc

    cx = e1y * dz - e1z * dy                              # (R, 128)
    cy = e1z * dx - e1x * dz
    cz = e1x * dy - e1y * dx
    det = cx * e2x + cy * e2y + cz * e2z
    inv = 1.0 / jnp.where(det == 0, 1.0, det)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    qx = sy * e2z - sz * e2y
    qy = sz * e2x - sx * e2z
    qz = sx * e2y - sy * e2x
    t = -inv * (qx * e1x + qy * e1y + qz * e1z)
    u = -inv * (qx * dx + qy * dy + qz * dz)
    v = inv * (cx * sx + cy * sy + cz * sz)
    ok = (
        (jnp.abs(det) > 0)
        & (t > t0)
        & (t < t_lim)
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (1.0 - u - v >= 0.0)
    )
    return _key_min(jnp.where(ok, t, MISS_T))


def _wt_constants(dc):
    """Per-ray (R, 1) permutation/shear constants of the watertight test
    — they depend only on the ray DIRECTION, so callers that evaluate
    many leaves against the same rays (the sweep visits ~89 leaves per
    sorted tile) compute them ONCE per tile instead of per visit."""
    dx, dy, dz = dc
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    domx = (adx >= ady) & (adx >= adz)                    # (R, 1) kz == 0
    domy = ~domx & (ady >= adz)                           # kz == 1

    def sel(px, py, pz):
        return jnp.where(domx, px, jnp.where(domy, py, pz))

    # permuted ray direction: new z = dominant axis, x/y the cyclic others
    d_z = sel(dx, dy, dz)
    d_x = sel(dy, dz, dx)
    d_y = sel(dz, dx, dy)
    sx = -d_x / d_z
    sy = -d_y / d_z
    sz = 1.0 / d_z
    return domx, domy, sx, sy, sz


# Edge-function fallback policy for the watertight leaf. The trigger is
# |e| <= (|p1| + |p2|) * 2^-22 (core/watertight._EDGE_REL_TOL), NOT
# e == 0: exact-zero detection is destroyed by fma contraction — XLA/
# Mosaic may fuse the product difference so an exactly-cancelling pair
# leaves a +/-1-ulp residue instead of 0.0, and whether that happens
# depends on the SURROUNDING code (measured round 5: the round-4 kernel
# only passed the shared-edge leak hunt because the dop operand reuse
# happened to suppress the contraction). Modes:
#   "always" — compensated recomputation evaluated densely, selected
#              under the threshold (matches core/watertight.py edge_fn);
#   "guard"  — ONE any-under-threshold scalar check per leaf skips the
#              whole ~90-op compensated evaluation when no lane is near
#              cancellation (the common case); taken branches match
#              "always";
#   "off"    — no fallback (perf-bound measurement ONLY: loses the
#              watertight guarantee on exactly-grazed edges).
# Module-level for the perf harness's A/B. Chip A/B (round 5, sorted 32k
# shuffled, terrain100k): MT 4.15 ms, always 5.19 (1.25x), guard 5.51
# (1.33x — the per-leaf any() scalar sync costs more than the dense
# compensation it skips), off 4.57 (1.10x bound) -> "always" is both the
# fastest correct mode and bit-stable against the CPU oracle.
_WT_FALLBACK = "always"


def _leaf_wt_chunk(blk, oc, dc, t0, t_lim, consts=None):
    """(R rays, 128 tris) PBRT shear WATERTIGHT test — the leak-free
    alternative to _leaf_mt_chunk (same contract), selected by
    `watertight=True` / RenderConfig.cluster_watertight.

    Algorithm of reference mathematics/intersection_taichi.py:94-161 in
    the kernel's dual layout: per-ray permutation/shear constants are
    (R, 1) columns (precomputable once per tile — `consts` from
    _wt_constants), triangle vertices are (1, 128) lane rows, and the
    axis permutation is two nested selects per component (core/
    watertight.py _permute does the same outside the kernel). The exact-
    zero edge-function fallback is the compensated difference-of-products
    (core/watertight.py diff_of_products), pure f32, applied per
    _WT_FALLBACK.

    Documented divergence from the reference: intersection_taichi.py:141
    rejects |det| <= 1e-4 and recomputes ALL THREE edge functions in f64
    whenever any is zero; this leaf (like core/watertight.py, the repo
    convention) accepts any |det| > 0 and recomputes only the exactly-
    zero edges with compensated f32 — near-degenerate slivers the
    reference's threshold rejects can therefore hit here. Intentional:
    TPUs have no fast f64, the compensated product recovers the correct
    edge sign, and rejecting thin-but-real geometry is the worse failure
    mode for watertightness.
    """
    from pyrenderer_tpu.core.watertight import diff_of_products

    v0 = (blk[0:1, :], blk[1:2, :], blk[2:3, :])
    v1 = tuple(v0[a] + blk[3 + a:4 + a, :] for a in range(3))   # v0 + e1
    v2 = tuple(v0[a] + blk[6 + a:7 + a, :] for a in range(3))   # v0 + e2
    domx, domy, sx, sy, sz = consts if consts is not None else \
        _wt_constants(dc)

    def sel(px, py, pz):
        """Component kz of (px, py, pz) per ray."""
        return jnp.where(domx, px, jnp.where(domy, py, pz))

    def shear(v):
        tx = v[0] - oc[0]                                 # (R, 128)
        ty = v[1] - oc[1]
        tz = v[2] - oc[2]
        pz = sel(tx, ty, tz)
        px = sel(ty, tz, tx)
        py = sel(tz, tx, ty)
        return px + sx * pz, py + sy * pz, pz

    x0, y0, z0 = shear(v0)
    x1, y1, z1 = shear(v1)
    x2, y2, z2 = shear(v2)

    from pyrenderer_tpu.core.watertight import _EDGE_REL_TOL

    pairs = ((x1, y2, y1, x2), (x2, y0, y2, x0), (x0, y1, y0, x1))
    es, lows = [], []
    for a, b, c, d in pairs:
        p1 = a * b
        p2 = c * d
        e = p1 - p2
        es.append(e)
        lows.append(
            jnp.abs(e) <= (jnp.abs(p1) + jnp.abs(p2)) * _EDGE_REL_TOL
        )
    e0, e1, e2 = es

    def compensate(es):
        return tuple(
            jnp.where(lo, diff_of_products(a, b, c, d), e)
            for e, lo, (a, b, c, d) in zip(es, lows, pairs)
        )

    if _WT_FALLBACK == "always":
        e0, e1, e2 = compensate((e0, e1, e2))
    elif _WT_FALLBACK == "guard":
        # one vector->scalar any() per leaf; the ~90-op compensated
        # evaluation only runs when some lane is near cancellation
        any_low = jnp.any(lows[0] | lows[1] | lows[2])
        e0, e1, e2 = jax.lax.cond(
            any_low, compensate, lambda es: es, (e0, e1, e2)
        )

    mixed = ((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0))
    det = e0 + e1 + e2
    t = (e0 * z0 + e1 * z1 + e2 * z2) * sz / jnp.where(det == 0, 1.0, det)
    ok = (~mixed) & (jnp.abs(det) > 0) & (t > t0) & (t < t_lim)
    return _key_min(jnp.where(ok, t, MISS_T))


def _leaf_reduce(tri_ref, j, rcol, t0, t_lim_col, watertight,
                 wt_consts=None):
    """Full 128-ray leaf for cluster j: (128 rays x 128 tris) at full
    vector width, immediately reduced to the (128, 1) packed key min
    (t bits | winning lane). wt_consts: per-tile precomputed watertight
    shear constants (_wt_constants) — hoisted by the sweep so ~89 visits
    per sorted tile don't each re-derive them.

    Measured on-chip (perf/RESULTS.md): the full-width evaluation in a
    slim while-loop costs ~0.8 us; a 16-chunk (8, 128) "register-
    resident" variant measured 2.4x SLOWER — Mosaic schedules the big
    shapes fine and the chunking only multiplied bookkeeping.
    """
    blk = tri_ref[pl.ds(j * TRI_ROWS, TRI_ROWS), :]       # (16, 128)
    oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])
    dc = (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])
    if watertight:
        return _leaf_wt_chunk(blk, oc, dc, t0, t_lim_col, consts=wt_consts)
    return _leaf_mt_chunk(blk, oc, dc, t0, t_lim_col)     # (128, 1)


def _bitw32():
    return jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (2 * GROUP, 1), 0)
    )


def _bitw16():
    return jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
    )


def _peel2(word, g, order_smem, dummy_sid):
    """Pop the next TWO flagged ranks of 32-bit word `word` (word group g).

    Returns (s1, s2, remaining_word, n_real): s1 is the nearest flagged
    supercluster, s2 the next — or the dummy all-NaN supercluster when the
    word holds only one remaining bit (borrowing across words is skipped
    for simplicity; the dummy costs one wasted child cull per odd word).
    n_real is 1 or 2: how many REAL superclusters this pop consumed (the
    visit-budget accounting must not charge for the dummy)."""
    low1 = word & -word
    rank1 = g * 32 + _ctz_low(low1)
    w2 = word & (word - 1)
    low2 = w2 & -w2
    have2 = low2 != 0
    rank2 = g * 32 + _ctz_low(jnp.where(have2, low2, jnp.int32(1)))
    s1 = order_smem[rank1]
    s2 = jnp.where(have2, order_smem[rank2], dummy_sid)
    return s1, s2, w2 & (w2 - 1), jnp.where(have2, jnp.int32(2), jnp.int32(1))


def _closest_kernel(n_groups, t0, watertight, sub, budget, resume,
                    dummy_sid, order_smem, *refs):
    """resume=False: operands are (order, rays, rcol, scene...) and outputs
    (t, slot) — byte-identical block structure to the round-3 kernel, zero
    cost for the suspend/resume machinery. resume=True adds t_in/slot_in
    inputs and a done output."""
    if resume:
        (rays_ref, rcol_ref, tin_ref, sin_ref, super_ref, bitw_ref,
         child_ref, tri_ref, t_out, slot_out, done_out) = refs
    else:
        (rays_ref, rcol_ref, super_ref, bitw_ref, child_ref, tri_ref,
         t_out, slot_out) = refs
    bitw32 = _bitw32()
    bitw16 = _bitw16()

    def sub_tile(st, _):
        o, d, inv, t1 = _ray_planes(rays_ref, st)
        rcol = rcol_ref[pl.ds(st * RAY_TILE, RAY_TILE), :]    # (128, 8)
        t1c = rcol[:, 6:7]
        if resume:
            tin = tin_ref[pl.ds(st * RAY_TILE, RAY_TILE), :]  # (128, 1)
            sin = sin_ref[pl.ds(st * RAY_TILE, RAY_TILE), :]
            # per-ray effective bound: caller t1 AND the carried-in best t
            # from the previous round — one transpose into lane space
            t1_eff = jnp.minimum(t1, jnp.transpose(jnp.minimum(tin, t1c)))
        else:
            tin = jnp.full((RAY_TILE, 1), MISS_T_MASKED, jnp.float32)
            sin = jnp.full((RAY_TILE, 1), -1, jnp.int32)
            t1_eff = t1

        # dense prepass over every supercluster box, bounded per ray;
        # super_ref rows are pre-sorted front-to-back, so bit rank == visit
        # order
        smask = _box_slab(super_ref[...], o, inv, t0, t1_eff)
        words = _pack_bits(smask, bitw_ref[...], n_groups)

        wt_consts = _wt_constants(
            (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])
        ) if watertight else None                         # once per tile

        def leaf(j, t_best, slot_best):
            kmin = _leaf_reduce(
                tri_ref, j, rcol, t0, jnp.minimum(t_best, t1c), watertight,
                wt_consts,
            )                                             # (128, 1) keys
            t_new = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(kmin, ~jnp.int32(127)), jnp.float32
            )
            lane = jnp.bitwise_and(kmin, 127)
            better = t_new < t_best
            t_best = jnp.where(better, t_new, t_best)
            slot_best = jnp.where(better, j * LANE_TRIS + lane, slot_best)
            return t_best, slot_best

        def finish_visit(cbits, j_of_bit, t_best, slot_best, t_lane):
            def lbody(carry):
                cb, t_best, slot_best = carry
                c = _ctz_low(cb & -cb)
                t_best, slot_best = leaf(j_of_bit(c), t_best, slot_best)
                return cb & (cb - 1), t_best, slot_best

            _, t_best, slot_best = jax.lax.while_loop(
                lambda c: c[0] != 0, lbody, (cbits, t_best, slot_best)
            )
            if _TLANE_REFRESH:
                # refresh the lane-space per-ray bound: one (128,1)->(1,128)
                # relayout per visit, no scalar extraction
                t_lane = jnp.minimum(
                    t1_eff, jnp.transpose(jnp.minimum(t_best, t1c))
                )
            return t_best, slot_best, t_lane

        def sweep_word(g, word, carry):
            def wbody(c):
                word, t_best, slot_best, t_lane, visits = c
                if _PAIR_PEEL:
                    s1, s2, word, step = _peel2(word, g, order_smem,
                                                dummy_sid)
                    cbits = _child_bits2(child_ref, s1, s2, o, inv, t0,
                                         t_lane, bitw32)
                    base1 = s1 * GROUP
                    base2 = s2 * GROUP - GROUP
                    j_of_bit = lambda c: jnp.where(
                        c < GROUP, base1 + c, base2 + c)
                else:
                    rank = g * 32 + _ctz_low(word & -word)
                    word = word & (word - 1)
                    s1 = order_smem[rank]
                    cbits = _child_bits(child_ref, s1, o, inv, t0, t_lane,
                                        bitw16)
                    base1 = s1 * GROUP
                    j_of_bit = lambda c: base1 + c
                    step = 1
                t_best, slot_best, t_lane = finish_visit(
                    cbits, j_of_bit, t_best, slot_best, t_lane)
                return word, t_best, slot_best, t_lane, visits + step

            if budget > 0:
                cond = lambda c: (c[0] != 0) & (c[4] < budget)
            else:
                cond = lambda c: c[0] != 0
            out = jax.lax.while_loop(cond, wbody, (word, *carry))
            return out[1:], out[0]

        carry = (
            tin,                                          # (128, 1) resume t
            sin,                                          # (128, 1) resume slot
            t1_eff,                                       # (1, 128) per-ray
            jnp.int32(0),                                 # visit count
        )
        pending = jnp.int32(0)
        for g in range(n_groups):   # static: one while-loop per 32-bit word
            carry, leftover = sweep_word(g, words[g], carry)
            pending = pending | leftover
        t_best, slot_best, _, _ = carry
        t_out[pl.ds(st * RAY_TILE, RAY_TILE), :] = t_best
        slot_out[pl.ds(st * RAY_TILE, RAY_TILE), :] = slot_best
        if resume:
            done_out[pl.ds(st * RAY_TILE, RAY_TILE), :] = jnp.where(
                pending != 0, 0, 1
            ) + jnp.zeros((RAY_TILE, 1), jnp.int32)
        return 0

    # SUB ray tiles share one grid step: per-step DMA/pipeline overhead
    # (measured ~10 us — the round-2 throughput floor) amortizes sub-fold
    jax.lax.fori_loop(0, sub, sub_tile, 0)


def _anyhit_kernel(n_groups, t0, watertight, sub, dummy_sid, order_smem,
                   rays_ref, rcol_ref, super_ref, bitw_ref, child_ref,
                   tri_ref, occ_out):
    bitw32 = _bitw32()
    bitw16 = _bitw16()

    def sub_tile(st, _):
        o, d, inv, t1 = _ray_planes(rays_ref, st)
        rcol = rcol_ref[pl.ds(st * RAY_TILE, RAY_TILE), :]
        t1c = rcol[:, 6:7]

        smask = _box_slab(super_ref[...], o, inv, t0, t1)
        words = _pack_bits(smask, bitw_ref[...], n_groups)

        wt_consts = _wt_constants(
            (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])
        ) if watertight else None                         # once per tile

        def finish_visit(cbits, j_of_bit, occ):
            # occ lives in column form (the leaf's output space); occluded
            # rays contribute nothing further because their leaf t-window
            # collapses to (t0, t0). The tile-level early break re-extracts
            # ONE scalar per visit — occ can only change under a visit.
            def lbody(carry):
                cb, occ = carry
                c = _ctz_low(cb & -cb)
                kmin = _leaf_reduce(
                    tri_ref, j_of_bit(c), rcol, t0,
                    jnp.where(occ > 0, t0, t1c), watertight, wt_consts,
                )
                return cb & (cb - 1), jnp.maximum(
                    occ, (kmin < MISS_MASKED_BITS).astype(jnp.int32)
                )

            _, occ = jax.lax.while_loop(
                lambda c: c[0] != 0, lbody, (cbits, occ)
            )
            return occ, RAY_TILE - jnp.sum(occ)

        def sweep_word(g, word, carry):
            def wbody(c):
                word, occ, undecided = c
                if _PAIR_PEEL:
                    s1, s2, word, _n = _peel2(word, g, order_smem,
                                              dummy_sid)
                    cbits = _child_bits2(child_ref, s1, s2, o, inv, t0, t1,
                                         bitw32)
                    base1 = s1 * GROUP
                    base2 = s2 * GROUP - GROUP
                    j_of_bit = lambda c: jnp.where(
                        c < GROUP, base1 + c, base2 + c)
                else:
                    rank = g * 32 + _ctz_low(word & -word)
                    word = word & (word - 1)
                    s1 = order_smem[rank]
                    cbits = _child_bits(child_ref, s1, o, inv, t0, t1,
                                        bitw16)
                    base1 = s1 * GROUP
                    j_of_bit = lambda c: base1 + c
                occ, undecided = finish_visit(cbits, j_of_bit, occ)
                return word, occ, undecided

            return jax.lax.while_loop(
                lambda c: (c[0] != 0) & (c[2] > 0), wbody, (word, *carry)
            )[1:]

        carry = (jnp.zeros((RAY_TILE, 1), jnp.int32), jnp.int32(RAY_TILE))
        for g in range(n_groups):
            carry = sweep_word(g, words[g], carry)
        occ_out[pl.ds(st * RAY_TILE, RAY_TILE), :] = carry[0]
        return 0

    jax.lax.fori_loop(0, sub, sub_tile, 0)


def _sc_order(cs: ClusterScene, ro):
    """Front-to-back supercluster rank for this wavefront: sort boxes by
    distance of their center from the mean ray origin. Exact for primary
    rays (shared origin); a good heuristic for sorted bounce wavefronts.

    Returns order (S_pad,) i32 (rank -> original supercluster id; padded
    ranks map to the NaN-boxed padding rows, whose bits never set) and the
    correspondingly permuted supercluster row table for the kernel's
    prepass — the bit rank IS the visit order, so the sweep needs no
    per-step indirection beyond one SMEM lookup."""
    s = cs.n_superclusters
    s_pad = cs.super_cols.shape[0]
    centers = 0.5 * (cs.super_box[0:3] + cs.super_box[3:6])   # (3, S)
    mean_o = jnp.mean(ro, axis=0)
    d2 = jnp.sum((centers - mean_o[:, None]) ** 2, axis=0)
    order = jnp.argsort(d2).astype(jnp.int32)
    order = jnp.concatenate(
        [order, jnp.arange(s, s_pad, dtype=jnp.int32)]
    )
    return order, cs.super_cols[order]


def _pack_rays(ro, rd, t1v):
    """-> (rays_lane (nt*8, 128), rays_col (N, 8)) f32, N a 128-multiple."""
    n = ro.shape[0]
    cols = jnp.concatenate(
        [ro.astype(jnp.float32), rd.astype(jnp.float32),
         t1v[:, None].astype(jnp.float32), jnp.zeros((n, 1), jnp.float32)],
        axis=1,
    )                                                     # (N, 8)
    nt = n // RAY_TILE
    lane = cols.reshape(nt, RAY_TILE, 8).transpose(0, 2, 1).reshape(nt * 8,
                                                                    RAY_TILE)
    return lane, cols


def _ray_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # rank -> super id
        pl.BlockSpec((8 * SUB_TILES, RAY_TILE), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),            # rays lane-form
        pl.BlockSpec((RAY_TILE * SUB_TILES, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),            # rays col-form
    ]


_SCENE_IN_SPECS = [
    pl.BlockSpec(memory_space=pltpu.VMEM),                # sorted super rows
    pl.BlockSpec(memory_space=pltpu.VMEM),                # bit weights
    pl.BlockSpec(memory_space=pltpu.VMEM),                # child boxes
    pl.BlockSpec(memory_space=pltpu.VMEM),                # tri table
]

_COL_SPEC = pl.BlockSpec((RAY_TILE * SUB_TILES, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)


@partial(jax.jit,
         static_argnames=("t0", "watertight", "interpret", "budget"))
def _sweep(cs: ClusterScene, rays_lane, rays_col, t_in, slot_in, order,
           super_sorted, t0, watertight=False, interpret=False, budget=0):
    """One closest-hit sweep pass. t_in/slot_in: (N, 1) resume state, or
    None for a fresh full sweep — then the kernel compiles WITHOUT the
    resume operands/outputs (same block structure as the round-3 kernel;
    the suspend/resume machinery costs nothing unless used). budget > 0
    caps visited superclusters per sub-tile; the done output (resume-mode
    only) marks tiles whose flagged set was exhausted (1) vs suspended on
    budget (0)."""
    n = rays_col.shape[0]
    grid = (n // (RAY_TILE * SUB_TILES),)
    n_groups = cs.super_cols.shape[0] // 32
    resume = t_in is not None
    # shard_map(check_vma) support: outputs inherit the rays' varying axes;
    # replicated scene tables are promoted to match (kernels/vma.py)
    v = vma.args_vma(rays_lane, rays_col, t_in, slot_in) if resume else \
        vma.args_vma(rays_lane, rays_col)
    order = vma.promote(order, v)
    super_sorted = vma.promote(super_sorted, v)
    bitw_v = vma.promote(cs.bitw, v)
    child_v = vma.promote(cs.child_box, v)
    tri_v = vma.promote(cs.tri, v)
    if resume:
        t, slot, done = pl.pallas_call(
            partial(_closest_kernel, n_groups, t0, watertight, SUB_TILES,
                    budget, True, cs.dummy_super),
            grid=grid,
            in_specs=_ray_specs() + [_COL_SPEC, _COL_SPEC] + _SCENE_IN_SPECS,
            out_specs=[_COL_SPEC, _COL_SPEC, _COL_SPEC],
            out_shape=[
                vma.struct((n, 1), jnp.float32, v),
                vma.struct((n, 1), jnp.int32, v),
                vma.struct((n, 1), jnp.int32, v),
            ],
            interpret=interpret,
        )(order, rays_lane, rays_col, t_in, slot_in, super_sorted, bitw_v,
          child_v, tri_v)
        return t[:, 0], slot[:, 0], done[:, 0]
    t, slot = pl.pallas_call(
        partial(_closest_kernel, n_groups, t0, watertight, SUB_TILES,
                budget, False, cs.dummy_super),
        grid=grid,
        in_specs=_ray_specs() + _SCENE_IN_SPECS,
        out_specs=[_COL_SPEC, _COL_SPEC],
        out_shape=[
            vma.struct((n, 1), jnp.float32, v),
            vma.struct((n, 1), jnp.int32, v),
        ],
        interpret=interpret,
    )(order, rays_lane, rays_col, super_sorted, bitw_v, child_v, tri_v)
    return t[:, 0], slot[:, 0], None


@partial(jax.jit, static_argnames=("t0", "watertight", "interpret"))
def _sweep_any(cs: ClusterScene, rays_lane, rays_col, order, super_sorted, t0,
               watertight=False, interpret=False):
    n = rays_col.shape[0]
    grid = (n // (RAY_TILE * SUB_TILES),)
    n_groups = cs.super_cols.shape[0] // 32
    v = vma.args_vma(rays_lane, rays_col)
    order = vma.promote(order, v)
    super_sorted = vma.promote(super_sorted, v)
    occ = pl.pallas_call(
        partial(_anyhit_kernel, n_groups, t0, watertight, SUB_TILES,
                cs.dummy_super),
        grid=grid,
        in_specs=_ray_specs() + _SCENE_IN_SPECS,
        out_specs=_COL_SPEC,
        out_shape=vma.struct((n, 1), jnp.int32, v),
        interpret=interpret,
    )(order, rays_lane, rays_col, super_sorted, vma.promote(cs.bitw, v),
      vma.promote(cs.child_box, v), vma.promote(cs.tri, v))
    return occ[:, 0] > 0


# Probed on the real v5e (2026-08-21): 199,712 tris = 13.1 MiB of cluster
# tables compiles and runs; 327,680 tris = 21.3 MiB dies inside the remote
# compiler with an opaque HTTP-500 (VMEM is ~16 MiB/core and the sweep
# keeps the whole scene resident). Guarded here so users get an actionable
# error instead. Override via PYRENDERER_VMEM_LIMIT_MB for other parts.
_VMEM_LIMIT_MB = float(
    __import__("os").environ.get("PYRENDERER_VMEM_LIMIT_MB", "14.5")
)


def _vmem_mb(cs: ClusterScene, kind: str = "sweep") -> float:
    """VMEM the traversal keeps resident, MiB. The binned path holds the
    tri table + bin boxes (ADVICE r4: its budget differs from the
    sweep's child/super boxes, though tri dominates both)."""
    if kind == "binned":
        resident = cs.tri.size + cs.bin_box.size
    else:
        resident = cs.tri.size + cs.child_box.size + cs.super_cols.size
    return resident * 4 / 2**20


def scene_fits_vmem(cs: ClusterScene, kind: str = "sweep") -> bool:
    """True when the whole clustered scene fits the measured VMEM budget —
    the routing predicate for resident vs HBM-streamed traversal."""
    return _vmem_mb(cs, kind) <= _VMEM_LIMIT_MB


def _check_vmem(cs: ClusterScene, kind: str = "sweep") -> None:
    mb = _vmem_mb(cs, kind)
    if mb > _VMEM_LIMIT_MB:
        raise ValueError(
            f"cluster tables need {mb:.1f} MiB of VMEM "
            f"(~{cs.n_clusters * LANE_TRIS} triangle slots) but the "
            f"{'binned traversal' if kind == 'binned' else 'sweep'} keeps "
            f"the whole scene on-chip and ~{_VMEM_LIMIT_MB:.0f} MiB is the "
            "measured ceiling on v5e. Oversize scenes normally auto-route "
            "to the HBM-streamed binned traversal (kernels/pallas_binned "
            "streamed=True); alternatively shard the geometry over devices "
            "(dist/geometry.py build_shard_clusters) or use the CPU bvh "
            "backend. Override with PYRENDERER_VMEM_LIMIT_MB on bigger "
            "parts."
        )


def _prepare(cs, ro, rd, t1, sort):
    """Sort (optional) + pad + pack. Returns the packed dual ray forms, the
    external perm (None when unsorted), the caller ray count, and the
    padded raw arrays (for multi-round resume re-packing)."""
    n = ro.shape[0]
    t1v = jnp.broadcast_to(t1, (n,)).astype(jnp.float32)
    if sort:
        keys = sort_keys(cs, ro, rd)
        # dead lanes (t1 = 0: terminated paths, NEE-impossible shadow
        # rays) sort LAST — live rays then compact into fewer, denser
        # tiles whose leaf unions amortize better, and all-dead trailing
        # tiles cull everything in the kernel prepass (~0.7 us/tile).
        # Without this the integrator's masked-dead lanes keep their
        # STALE coherence keys and dilute live tiles.
        keys = jnp.where(t1v > 0, keys, jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(keys)
        ro, rd, t1v = ro[perm], rd[perm], t1v[perm]
    else:
        perm = None
    pad = (-n) % (RAY_TILE * SUB_TILES)
    if pad:
        # padding rays: degenerate direction handled by the where() in
        # _ray_planes; t1 = 0 culls every box
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], rd.dtype), (pad, 1))]
        )
        t1v = jnp.concatenate([t1v, jnp.zeros((pad,), jnp.float32)])
    lane, cols = _pack_rays(ro, rd, t1v)
    return lane, cols, perm, n, (ro, rd, t1v)


def closest_hit(cs: ClusterScene, ro, rd, t0, t1, sort=False,
                watertight=False, interpret=False, rounds=1, budget=0,
                exact_t=True):
    """Wavefront closest hit. ro, rd (N, 3); t1 scalar or (N,).

    Returns (hit (N,) bool, t (N,) f32, face (N,) i32 original ids) — the
    same contract as the other backends. Internally the kernel packs t
    and the winning lane into one int32 (one cross-lane reduction per
    leaf, <= 2^-17 relative truncation); the exact t is re-derived at the
    boundary with one Moeller-Trumbore evaluation of the winning triangle
    (accel/clusters.exact_t_for_slot), so callers see exact f32 t.

    sort=True applies the coherence sort (accel/clusters.sort_keys:
    origin-Morton major | 9-bit quantized direction, dead t1=0 lanes
    last) before tiling — measured 2.5x+ on shuffled bounce wavefronts.
    The integrator resolves RenderConfig.cluster_sort="auto" by scene
    size (integrator.resolve_cluster_sort: the ~6 ms/query sort glue only
    pays past ~32k triangles) and passes the concrete flag here.

    rounds > 1 with budget > 0 enables SUSPEND/RESUME traversal: the first
    pass sweeps at most `budget` superclusters per 128-ray tile (visits are
    front-to-back, so nearby hits land first), then unresolved rays are
    stably re-sorted to the front (compaction: finished rays form all-dead
    trailing tiles that cull in the prepass) and a final unbudgeted pass
    finishes them with per-ray t bounds carried over. Work concentrates in
    the ~3 nearest flagged superclusters per ray (measured, perf/RESULTS.md
    round 4), so the resume wavefront is a small fraction of the original.
    Exact: the resume pass re-culls every supercluster that could still
    beat the carried t.

    The selection is discrete — callers re-evaluate hit geometry
    differentiably (the integrator does), so inputs are detached here:
    pallas_call has no autodiff rule and bounce rays carry tangents.

    Off-TPU (and not explicitly interpreting the kernel) this routes to
    the dense pure-JAX twin accel/clusters.closest_hit_ref — same results,
    no per-tile interpreted grid.
    """
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import closest_hit_ref

        # the fallback honors `watertight` too: same config -> same hit
        # set on CPU and TPU (round-3 weakness: it silently used MT)
        hit, t, slot = closest_hit_ref(cs, ro, rd, t0, t1,
                                       watertight=watertight)
        return hit, t, slot_to_face(cs, slot).astype(jnp.int32)
    _check_vmem(cs)
    lane, cols, perm, n, (ro_p, rd_p, t1_p) = _prepare(cs, ro, rd, t1, sort)
    order, super_sorted = _sc_order(cs, ro[:n] if perm is None else ro)
    npad = cols.shape[0]
    multi = rounds > 1 and budget > 0
    if multi:
        t_in = jnp.full((npad, 1), MISS_T_MASKED, jnp.float32)
        slot_in = jnp.full((npad, 1), -1, jnp.int32)
    else:
        t_in = slot_in = None  # fast path: no resume plumbing compiled in
    t, slot, done = _sweep(cs, lane, cols, t_in, slot_in, order,
                           super_sorted, float(t0), watertight=watertight,
                           interpret=interpret, budget=budget if multi else 0)
    for _ in range(rounds - 1 if multi else 0):
        # unresolved tiles first (stable: coherence order preserved within
        # each group); resolved rays become dead (t1 = 0) trailing tiles
        uf = jnp.argsort(done)
        t1_b = jnp.where(done > 0, 0.0, t1_p)
        lane_b, cols_b = _pack_rays(ro_p[uf], rd_p[uf], t1_b[uf])
        t_b, slot_b, done_b = _sweep(
            cs, lane_b, cols_b, t[uf][:, None], slot[uf][:, None], order,
            super_sorted, float(t0), watertight=watertight,
            interpret=interpret, budget=0,
        )
        back = jnp.zeros_like(uf).at[uf].set(jnp.arange(npad, dtype=uf.dtype))
        t, slot, done = t_b[back], slot_b[back], done_b[back]
    t, slot = t[:n], slot[:n]
    if perm is not None:
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n))
        t, slot = t[inv], slot[inv]
    hit = slot >= 0
    face = slot_to_face(cs, slot)
    if exact_t:
        # undo the packed <= 2^-17 rounding at the public boundary;
        # exact_t=False skips the 9-gather re-derivation for callers that
        # re-derive the hit geometry themselves (the integrator does)
        from pyrenderer_tpu.accel.clusters import exact_t_for_slot

        t = exact_t_for_slot(cs, slot, ro, rd, t)
    return hit, jnp.where(hit, t, 0.0), face.astype(jnp.int32)


def closest_hit_chunked(cc, ro, rd, t0, t1, sort=False, watertight=False,
                        interpret=False, rounds=1, budget=0, exact_t=True):
    """Closest hit over a ClusterChunks scene: sweep each VMEM-resident
    chunk sequentially, carrying the running per-ray best t as the next
    chunk's bound — far geometry culls against near hits exactly like
    the in-sweep ordered traversal, just at chunk granularity.

    Chip A/B (perf/chunkedsweep.py): beats the HBM-streamed binned path
    2.9-4.1x at 330k-500k tris, exact agreement. Each chunk call uses
    exact_t internally (~0.6 ms/chunk at 262k rays) so the carried bound
    is exact and the returned t is exact regardless of `exact_t`.
    Returned faces are global ids (chunk faces are contiguous ranges —
    accel/clusters.build_chunked_clusters — offset per chunk)."""
    n = ro.shape[0]
    t_best = jnp.full((n,), MISS_T, jnp.float32)
    face_best = jnp.zeros((n,), jnp.int32)
    hit_any = jnp.zeros((n,), bool)
    for i, cs in enumerate(cc.chunks):
        bound = jnp.where(hit_any, jnp.minimum(t_best, t1), t1)
        h, t, f = closest_hit(cs, ro, rd, t0, bound, sort=sort,
                              watertight=watertight, interpret=interpret,
                              rounds=rounds, budget=budget, exact_t=True)
        better = h & (t < jnp.where(hit_any, t_best, jnp.inf))
        t_best = jnp.where(better, t, t_best)
        face_best = jnp.where(
            better, f + jnp.int32(i * cc.faces_per_chunk), face_best
        )
        hit_any = hit_any | h
    return hit_any, jnp.where(hit_any, t_best, 0.0), face_best


def occluded_chunked(cc, ro, rd, t0, t1, sort=False, watertight=False,
                     interpret=False):
    """Any-hit over ClusterChunks: chunks sweep sequentially; rays
    already occluded trace the next chunk with t1 = 0 (every tile-level
    cull rejects them for free)."""
    n = ro.shape[0]
    occ = jnp.zeros((n,), bool)
    for cs in cc.chunks:
        t1_i = jnp.where(occ, 0.0, jnp.broadcast_to(t1, (n,)).astype(
            jnp.float32))
        occ = occ | occluded(cs, ro, rd, t0, t1_i, sort=sort,
                             watertight=watertight, interpret=interpret)
    return occ


def occluded(cs: ClusterScene, ro, rd, t0, t1, sort=False, watertight=False,
             interpret=False):
    """Any-hit shadow query: True where some triangle lies in (t0, t1).

    Dedicated kernel: rays retire as soon as anything occludes them and a
    tile breaks out of the sweep once every ray is decided — shadow rays
    are the cheapest queries, exactly as in a classic BVH renderer.
    Inputs detached and off-TPU routed to the pure-JAX twin (see
    closest_hit).
    """
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import occluded_ref

        return occluded_ref(cs, ro, rd, t0, t1, watertight=watertight)
    _check_vmem(cs)
    lane, cols, perm, n, _ = _prepare(cs, ro, rd, t1, sort)
    order, super_sorted = _sc_order(cs, ro[:n] if perm is None else ro)
    occ = _sweep_any(cs, lane, cols, order, super_sorted, float(t0),
                     watertight=watertight, interpret=interpret)
    occ = occ[:n]
    if perm is not None:
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n))
        occ = occ[inv]
    return occ
