"""Pallas TPU kernel: binned (ray x bin) pair traversal for incoherent
wavefronts over large scenes.

The lockstep tile sweep (kernels/pallas_cluster.py) is near-optimal for
COHERENT wavefronts: after the coherence sort, its tile-union leaf count
sits within ~1.3x of the per-ray-optimal sum. Its incoherent cost comes
from per-visit overheads — the vector->scalar bit-pack extract
(~0.3-0.7 us) and child culls per visited supercluster — multiplied by
the many superclusters a scattered tile touches. This module removes the
per-visit overheads by MOVING THE DATA-DEPENDENT ITERATION INTO ONE SORT:

  1. PREPASS (Pallas): rays in lanes, 8 bin AABBs per step — a dense
     per-ray x per-bin slab test (a BIN is 4 adjacent 128-triangle
     clusters = 512 triangles; median-split siblings, so the box is
     tight). Crossing bits pack into VMEM-scratch words, and the kernel
     peels the first W_SLOTS set bits per ray into candidate bin ids
     (vectorized ctz: isolate lowest bit, f32-exponent is the index),
     plus an overflow flag for the tail.
  2. SORT (XLA): one 3-array lax.sort bins the (bin, ray, slot) triples
     by bin id. Empty slots carry a sentinel key and sink to the end.
     Ray data follows with one jnp.take row gather whose indices are
     piecewise-ascending (fancy row-indexing of the same table measured
     ~60 ms on chip; sorted-index take is ~10x cheaper).
  3. LEAF (Pallas): per 128-pair block, iterate the block's DISTINCT bin
     ids (sorted, so typically one) with a masked while-loop: one scalar
     extract per distinct bin, then the bin's 4 clusters run the dense
     (128 pairs x 128 tris) Moeller-Trumbore/watertight chunks straight
     off the VMEM-resident (K*16, 128) triangle table, with per-pair t1
     bounds and 2 extra key bits for the cluster within the bin.
     All-sentinel blocks exit after one extract; all-sentinel grid steps
     after one.
  4. REDUCE (XLA): packed keys (masked t bits | triangle-in-bin) unsort
     to ray-major (N, W) and a min picks the closest hit. Overflow rays
     (> W_SLOTS crossing bins, the p95+ tail) re-trace exactly through
     the tile sweep under a lax.cond that costs nothing when none
     overflow.

Compared to the sweep on a shuffled bounce wavefront, each pair pays 512
dense tests with ZERO traversal overhead — and the VPU is so much faster
at dense work (~20 G tests/s measured) that this wins whenever the
wavefront's tile unions are large. Dead rays (t1 = 0) produce no
candidates, so terminated-path compaction falls out of the binning for
free, with no coherence sort anywhere.

Reference crosswalk: this plays the stackless BVH walk's role (reference
mathematics/intersection_taichi.py:256-287) for incoherent bounces; the
binning is the TPU answer to GPU wavefront tracers' per-node ray queues,
expressed as one sort plus two dense kernels instead of divergent queues.

In-kernel t carries <= 2^-14 relative rounding (the packed key spends 9
mantissa bits on the triangle-in-bin index); the exact t is re-derived
at the public boundary from the winning slot (exact_t_for_slot), so
closest_hit returns exact f32 t like the oracle.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrenderer_tpu.accel.clusters import (
    BIN,
    LANE_TRIS,
    MISS_T,
    ClusterScene,
    slot_to_face,
)
from pyrenderer_tpu.kernels import vma
from pyrenderer_tpu.kernels.pallas_cluster import (
    RAY_TILE,
    _box_slab,
    _check_vmem,
    _leaf_mt_chunk,
    _leaf_wt_chunk,
    _pack_rays,
    _ray_planes,
)

# candidate bin slots per ray: covers ~p95 of bounce/shadow wavefronts at
# the 512-triangle bin size (simulated on the terrain scenes); the tail
# routes through the sweep. Any value works (the pair stream pads to a
# block multiple). Env knob so tests and the perf harness can force the
# overflow path.
W_SLOTS = int(os.environ.get("PYRENDERER_BINNED_W", "6"))


def _w_slots() -> int:
    """Per-call read of the W knob (ADVICE r4: the import-time-only read
    silently ignored env changes mid-process). The env var wins when set;
    otherwise the module value (which tests monkeypatch)."""
    env = os.environ.get("PYRENDERER_BINNED_W")
    return int(env) if env is not None else W_SLOTS
SUB = 8            # ray tiles per prepass grid step (DMA amortization)
BPS = 16           # pair blocks per leaf grid step
SENTINEL = 0x7FFFFFFF   # empty candidate slot: sorts after every real id
BIN_TRIS = BIN * LANE_TRIS
_LOW = BIN_TRIS - 1     # low key bits carry the triangle index within a bin
# python int (a module-level jnp scalar would become a kernel constant):
# MISS_T's bits with the low index bits cleared — the all-miss key value
MISS_KEY = int(
    __import__("numpy").int32(
        __import__("numpy").float32(MISS_T).view(__import__("numpy").int32)
        & ~__import__("numpy").int32(_LOW)
    )
)


def _prepass_kernel(n_words, w_slots, t0, sub, rays_ref, box_ref, out_ref,
                    words_ref):
    """Per 128-ray tile: slab-test all KB bin boxes (8 per step, rays in
    lanes), pack per-ray crossing bits into (n_words, 128) VMEM scratch,
    then peel the first `w_slots` set bits per ray into candidate ids.

    out rows per sub-tile: w_slots id rows then one overflow row."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_words, RAY_TILE), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def sub_tile(st, _):
        o, _d, inv, t1 = _ray_planes(rays_ref, st)

        def word(w, _):
            acc = jnp.zeros((1, RAY_TILE), jnp.int32)
            for s in range(4):      # 4 x 8 boxes = one 32-bit word
                blk = box_ref[pl.ds((w * 4 + s) * 8, 8), :]
                crossed = _box_slab(blk, o, inv, t0, t1)
                w8 = jnp.left_shift(jnp.int32(1), s * 8 + iota8)
                # bits are disjoint per (s, sublane): add == or
                acc = acc + jnp.sum(
                    jnp.where(crossed, w8, 0), axis=0, keepdims=True
                )
            words_ref[pl.ds(w, 1), :] = acc
            return 0

        jax.lax.fori_loop(0, n_words, word, 0)

        ws = words_ref[...]                              # (n_words, 128)
        for slot in range(w_slots):
            first = jnp.min(
                jnp.where(ws != 0, rowi, jnp.int32(n_words)),
                axis=0, keepdims=True,
            )                                            # (1, 128)
            cand = jnp.sum(
                jnp.where(rowi == first, ws, 0), axis=0, keepdims=True
            )
            low = jnp.bitwise_and(cand, -cand)
            # index of the single set bit: exponent of the f32 cast
            # (int32 min would overflow the cast — special-case bit 31)
            is_min = low == jnp.int32(-2147483648)
            f = jnp.where(is_min, jnp.int32(0), low).astype(jnp.float32)
            bidx = jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(f, jnp.int32), 23
            ) - 127
            bidx = jnp.where(is_min, jnp.int32(31), bidx)
            has = cand != 0
            cid = jnp.where(has, first * 32 + bidx, jnp.int32(SENTINEL))
            out_ref[pl.ds(st * (w_slots + 1) + slot, 1), :] = cid
            cleared = jnp.bitwise_and(cand, cand - 1)
            ws = jnp.where(rowi == first, cleared, ws)
        leftover = jnp.sum(
            jnp.where(ws != 0, 1, 0).astype(jnp.int32), axis=0, keepdims=True
        )
        out_ref[pl.ds(st * (w_slots + 1) + w_slots, 1), :] = leftover
        return 0

    jax.lax.fori_loop(0, sub, sub_tile, 0)


def _leaf_kernel(bps, t0, watertight, ids_ref, rcol_ref, tri_ref, out_ref):
    """Per grid step: `bps` 128-pair blocks of the SORTED pair stream.
    Each block iterates its distinct bin ids (usually one — pairs are
    sorted by bin) with a masked while-loop: one scalar extract per
    distinct bin, then the bin's BIN clusters run the dense column-form
    leaf chunks (kernels/pallas_cluster._leaf_*_chunk) against all 128
    pairs, re-packed with the cluster-in-bin in key bits 7..8. Sentinel
    pairs (empty slots, sorted last) terminate the loop; an all-sentinel
    step exits after a single check."""
    from pyrenderer_tpu.accel.clusters import TRI_ROWS

    f = _leaf_wt_chunk if watertight else _leaf_mt_chunk

    for b in range(bps):
        out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = jnp.full(
            (RAY_TILE, 1), MISS_KEY, jnp.int32
        )

    # whole-step skip: ids ascend across the step's blocks, so if the very
    # first lane is the sentinel every pair in the step is padding
    @pl.when(ids_ref[0, 0] != SENTINEL)
    def _():
        def block(b, _):
            idr = ids_ref[pl.ds(b * RAY_TILE, RAY_TILE), :]   # (128, 1)
            rcol = rcol_ref[pl.ds(b * RAY_TILE, RAY_TILE), :]
            oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])
            dc = (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])
            t1c = rcol[:, 6:7]

            def body(c):
                m, rem, best = c
                cand = jnp.full((RAY_TILE, 1), MISS_KEY, jnp.int32)
                for ci in range(BIN):
                    blk = tri_ref[
                        pl.ds((m * BIN + ci) * TRI_ROWS, TRI_ROWS), :
                    ]
                    key7 = f(blk, oc, dc, t0, t1c)        # t|lane7
                    key9 = jnp.bitwise_or(
                        jnp.bitwise_and(key7, ~jnp.int32(_LOW)),
                        jnp.bitwise_or(
                            jnp.int32(ci << 7),
                            jnp.bitwise_and(key7, jnp.int32(127)),
                        ),
                    )
                    cand = jnp.minimum(cand, key9)
                mine = rem == m
                best = jnp.minimum(best, jnp.where(mine, cand, MISS_KEY))
                rem = jnp.where(mine, jnp.int32(SENTINEL), rem)
                return jnp.min(rem), rem, best

            init = (
                jnp.min(idr),
                idr,
                jnp.full((RAY_TILE, 1), MISS_KEY, jnp.int32),
            )
            _, _, best = jax.lax.while_loop(
                lambda c: c[0] != SENTINEL, body, init
            )
            out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = best
            return 0

        jax.lax.fori_loop(0, bps, block, 0)


def _prepass_call(cs: ClusterScene, rays_lane, t0, w_slots, interpret):
    """-> (ids (n_pad, W) int32 ascending-per-ray, overflow (n_pad,) bool)."""
    kb32 = cs.bin_box.shape[0]
    n_pad = rays_lane.shape[0] // 8 * RAY_TILE
    tiles = n_pad // RAY_TILE
    rows = w_slots + 1
    v = vma.args_vma(rays_lane)
    out = pl.pallas_call(
        partial(_prepass_kernel, kb32 // 32, w_slots, t0, SUB),
        grid=(tiles // SUB,),
        in_specs=[
            pl.BlockSpec((8 * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows * SUB, RAY_TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma.struct((rows * tiles, RAY_TILE), jnp.int32, v),
        scratch_shapes=[pltpu.VMEM((kb32 // 32, RAY_TILE), jnp.int32)],
        interpret=interpret,
    )(rays_lane, vma.promote(cs.bin_box, v))
    out = out.reshape(tiles, rows, RAY_TILE).transpose(0, 2, 1)
    out = out.reshape(n_pad, rows)
    return out[:, :w_slots], out[:, w_slots] > 0


def _leaf_call(cs: ClusterScene, sortd, prcol, t0, watertight, interpret):
    p_pad = prcol.shape[0]
    n_blocks = p_pad // RAY_TILE
    v = vma.args_vma(sortd, prcol)
    keys = pl.pallas_call(
        partial(_leaf_kernel, BPS, t0, watertight),
        grid=(n_blocks // BPS,),
        in_specs=[
            pl.BlockSpec((BPS * RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BPS * RAY_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # tri table resident
        ],
        out_specs=pl.BlockSpec((BPS * RAY_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma.struct((p_pad, 1), jnp.int32, v),
        interpret=interpret,
    )(sortd[:, None], prcol, vma.promote(cs.tri, v))
    return keys[:, 0]


@partial(jax.jit, static_argnames=("t0", "watertight", "interpret", "w"))
def _binned_core(cs: ClusterScene, ro, rd, t1v, t0, watertight, interpret, w):
    """-> (kmin (n_pad,) packed keys, binwin (n_pad,) winning bin,
    overflow (n_pad,) bool). Rays padded to a 128*SUB multiple by caller."""
    n_pad = ro.shape[0]
    lane, cols = _pack_rays(ro, rd, t1v)
    ids, ovf = _prepass_call(cs, lane, t0, w, interpret)

    flat = ids.reshape(-1)                          # (P,) ray-major
    p = flat.shape[0]
    pad = (-p) % (BPS * RAY_TILE)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), SENTINEL, jnp.int32)]
        )
    iota = jnp.arange(p + pad, dtype=jnp.int32)
    # one fused sort bins the pairs AND carries (ray, slot) along
    sortd, ray_s, perm = jax.lax.sort(
        [flat, iota // w, iota], num_keys=1
    )
    prcol = jnp.take(cols, ray_s, axis=0)           # (p_pad, 8)

    keys_sorted = _leaf_call(cs, sortd, prcol, t0, watertight, interpret)

    # unsort: original slot s sits at sorted position inv[s]
    inv = jnp.zeros((p + pad,), jnp.int32).at[perm].set(iota)
    key_s = jnp.take(keys_sorted, inv)[:p]
    keymat = key_s.reshape(n_pad, w)
    kmin = jnp.min(keymat, axis=1)
    amin = jnp.argmin(keymat, axis=1)
    binwin = jnp.take_along_axis(ids, amin[:, None], axis=1)[:, 0]
    return kmin, binwin, ovf


def _pad_rays(ro, rd, t1):
    n = ro.shape[0]
    t1v = jnp.broadcast_to(t1, (n,)).astype(jnp.float32)
    pad = (-n) % (RAY_TILE * SUB)
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], rd.dtype), (pad, 1))]
        )
        t1v = jnp.concatenate([t1v, jnp.zeros((pad,), jnp.float32)])
    return ro, rd, t1v, n


def closest_hit(cs: ClusterScene, ro, rd, t0, t1, watertight=False,
                interpret=False):
    """Binned closest hit: same contract as pallas_cluster.closest_hit
    (hit, t, face), including exact f32 t (the in-kernel <= 2^-14 packed
    rounding is undone at the boundary via exact_t_for_slot). Needs no
    coherence sort — performance is wavefront-order independent. Overflow
    rays (> W_SLOTS crossing bins) re-trace exactly through the tile
    sweep under a lax.cond that costs nothing when no ray overflows.
    Off-TPU (and not interpreting) routes to the pure-JAX oracle like the
    sweep does."""
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import closest_hit_ref

        hit, t, slot = closest_hit_ref(cs, ro, rd, t0, t1,
                                       watertight=watertight)
        return hit, t, slot_to_face(cs, slot).astype(jnp.int32)
    _check_vmem(cs, "binned")
    ro_p, rd_p, t1v, n = _pad_rays(ro, rd, t1)
    kmin, binwin, ovf = _binned_core(cs, ro_p, rd_p, t1v, float(t0),
                                     watertight, interpret, _w_slots())
    kmin, binwin, ovf = kmin[:n], binwin[:n], ovf[:n]
    hit = kmin < MISS_KEY
    t = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(kmin, ~jnp.int32(_LOW)), jnp.float32
    )
    slot = jnp.where(
        hit, binwin * BIN_TRIS + jnp.bitwise_and(kmin, _LOW), -1
    )
    from pyrenderer_tpu.accel.clusters import exact_t_for_slot

    t = exact_t_for_slot(cs, slot, ro, rd, t)   # undo the packed rounding

    def with_residual(_):
        from pyrenderer_tpu.kernels import pallas_cluster as pc

        t1r = jnp.where(ovf, t1v[:n], 0.0)
        return pc.closest_hit(cs, ro, rd, t0, t1r, sort=False,
                              watertight=watertight, interpret=interpret)

    def no_residual(_):
        return (
            jnp.zeros((n,), bool),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.int32),
        )

    h2, t2, f2 = jax.lax.cond(jnp.any(ovf), with_residual, no_residual, None)
    face = slot_to_face(cs, slot).astype(jnp.int32)
    hit_f = jnp.where(ovf, h2, hit)
    t_f = jnp.where(ovf, t2, jnp.where(hit, t, 0.0))
    face_f = jnp.where(ovf, f2, face)
    return hit_f, t_f, face_f


def occluded(cs: ClusterScene, ro, rd, t0, t1, watertight=False,
             interpret=False):
    """Binned any-hit: True where something lies in (t0, t1). Shadow rays
    carry bounded t1, so their candidate sets are the smallest of all
    query types; a hit found by the bounded closest-hit machinery IS an
    occlusion, and a miss proves clearance."""
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import occluded_ref

        return occluded_ref(cs, ro, rd, t0, t1, watertight=watertight)
    _check_vmem(cs, "binned")
    ro_p, rd_p, t1v, n = _pad_rays(ro, rd, t1)
    kmin, _, ovf = _binned_core(cs, ro_p, rd_p, t1v, float(t0),
                                watertight, interpret, _w_slots())
    kmin, ovf = kmin[:n], ovf[:n]
    occ = kmin < MISS_KEY

    def with_residual(_):
        from pyrenderer_tpu.kernels import pallas_cluster as pc

        t1r = jnp.where(ovf, t1v[:n], 0.0)
        return pc.occluded(cs, ro, rd, t0, t1r, sort=False,
                           watertight=watertight, interpret=interpret)

    occ2 = jax.lax.cond(jnp.any(ovf), with_residual,
                        lambda _: jnp.zeros((n,), bool), None)
    return jnp.where(ovf, occ2, occ)
