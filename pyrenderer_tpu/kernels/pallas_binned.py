"""Pallas TPU kernel: binned (ray x cluster) pair traversal for large scenes.

The lockstep tile sweep (kernels/pallas_cluster.py) pays for the UNION of
the clusters any ray in a 128-ray tile needs: an exact CPU replay measured
~89 leaf visits per sorted-incoherent tile on terrain100k — 0.70 visits
per ray slot — while a ray ALONE crosses only ~0.5 (bounce wavefronts) to
~2 (camera wavefronts) cluster AABBs on average (p99 <= 8; simulated on
the same wavefronts perf/RESULTS.md benchmarks). The union is the entire
incoherent-wavefront cost. This module removes it:

  1. PREPASS (Pallas): rays in lanes, 8 cluster boxes per step — a dense
     per-ray x per-cluster slab test, bit-packed per ray into ceil(K/32)
     int32 words held in VMEM scratch. The kernel then extracts up to
     W_SLOTS candidate cluster ids PER RAY (vectorized count-trailing-
     zeros: isolate lowest bit, exponent of its f32 cast is the index)
     plus an overflow flag for the p99 tail.
  2. BIN (XLA): the (N, W) candidate table flattens to (ray, cluster)
     pairs, argsorts by cluster id, and each cluster's pair run is padded
     to a 128-multiple, so every 128-pair block belongs to ONE cluster.
  3. LEAF (Pallas): per block, the block's cluster id — scalar-prefetched
     and fed to the triangle table's BlockSpec index_map, so Mosaic DMAs
     exactly that cluster's (16, 128) rows — runs ONE dense (128 pairs x
     128 tris) Moeller-Trumbore (or PBRT watertight) at full VPU width.
     No per-visit bit-pack extracts, no while-loops, no unions: leaf work
     is proportional to what each ray individually needs.
  4. REDUCE (XLA): per-pair packed keys (t bits | winning lane, the
     _key_min trick) gather back to ray-major (N, W) and a min picks the
     closest hit. Overflow rays (> W candidates, ~1%) re-run through the
     tile sweep under a lax.cond — exactness is never sacrificed.

Because the triangle table is streamed per block from HBM (the prepass
only keeps the (K, 128) cluster boxes resident), this path has NO VMEM
scene ceiling — scenes past the sweep's ~200k-triangle limit traverse
fine on one chip.

Reference crosswalk: this plays the role of the stackless BVH walk
(reference mathematics/intersection_taichi.py:256-287) for incoherent
wavefronts; the binning itself is the TPU answer to what GPU wavefront
tracers do with per-material/per-node ray queues — expressed as one sort
plus two dense kernels instead of divergent queues.

Dead rays (t1 = 0) produce zero candidates, so terminated-path compaction
falls out of the binning for free — no coherence sort, no dead-lane
shuffling, wavefront order is irrelevant.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrenderer_tpu.accel.clusters import (
    LANE_TRIS,
    TRI_ROWS,
    ClusterScene,
    slot_to_face,
)
from pyrenderer_tpu.kernels.pallas_cluster import (
    MISS_MASKED_BITS,
    RAY_TILE,
    _box_slab,
    _leaf_mt_chunk,
    _leaf_wt_chunk,
    _pack_rays,
)

# candidate cluster slots per ray. 8 covers p99 of both bounce and camera
# wavefronts on the simulated terrain scenes; the tail routes through the
# sweep. Env knob so tests can force the overflow path with a tiny W.
W_SLOTS = int(os.environ.get("PYRENDERER_BINNED_W", "8"))
SUB = 8            # ray tiles per prepass grid step (DMA amortization)
BPS = 8            # pair blocks per leaf grid step
SENTINEL = 0x7FFFFFFF   # empty candidate slot: sorts after every real id
MISS_KEY = int(MISS_MASKED_BITS)   # python int: a module-level jnp scalar
                                   # would be captured as a kernel constant


def _prepass_kernel(n_words, w_slots, t0, sub, rays_ref, child_ref, out_ref,
                    words_ref):
    """Per 128-ray tile: slab-test all K cluster boxes (8 per step, rays in
    lanes), pack per-ray crossing bits into (n_words, 128) VMEM scratch,
    then peel the first `w_slots` set bits per ray into candidate ids.

    out rows per sub-tile: w_slots id rows then one overflow row."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_words, RAY_TILE), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def sub_tile(st, _):
        r = rays_ref[pl.ds(st * 8, 8), :]
        o = (r[0:1, :], r[1:2, :], r[2:3, :])
        inv = tuple(1.0 / jnp.where(c == 0, 1e-20, c)
                    for c in (r[3:4, :], r[4:5, :], r[5:6, :]))
        t1 = r[6:7, :]

        def word(w, _):
            acc = jnp.zeros((1, RAY_TILE), jnp.int32)
            for s in range(4):      # 4 x 8 boxes = one 32-bit word
                blk = child_ref[pl.ds((w * 4 + s) * 8, 8), :]
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


def _leaf_kernel(bps, t0, watertight, ids_ref, valid_ref, rcol_ref,
                 *tri_and_out):
    """Per grid step: `bps` 128-pair blocks. Block b's cluster triangles
    arrive pre-DMA'd via the scalar-prefetched index_map (tri_and_out[b]);
    one dense (128, 128) leaf evaluation each, packed-key output."""
    tri_refs = tri_and_out[:bps]
    out_ref = tri_and_out[bps]
    step = pl.program_id(0)
    f = _leaf_wt_chunk if watertight else _leaf_mt_chunk
    for b in range(bps):
        rcol = rcol_ref[pl.ds(b * RAY_TILE, RAY_TILE), :]
        out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = jnp.full(
            (RAY_TILE, 1), MISS_KEY, jnp.int32
        )

        @pl.when(valid_ref[step * bps + b] > 0)
        def _(b=b, rcol=rcol):
            oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])
            dc = (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])
            t1c = rcol[:, 6:7]
            keys = f(tri_refs[b][...], oc, dc, t0, t1c)
            out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = keys

    return None


def _prepass_call(cs: ClusterScene, rays_lane, t0, w_slots, interpret):
    """-> (ids (n_pad, W) int32 ascending-per-ray, overflow (n_pad,) bool)."""
    k = cs.n_clusters
    k32 = -(-k // 32) * 32
    child = cs.child_box[:k]
    if k32 > k:
        child = jnp.concatenate(
            [child, jnp.full((k32 - k, LANE_TRIS), jnp.nan, jnp.float32)]
        )
    n_pad = rays_lane.shape[0] // 8 * RAY_TILE
    tiles = n_pad // RAY_TILE
    rows = w_slots + 1
    out = pl.pallas_call(
        partial(_prepass_kernel, k32 // 32, w_slots, t0, SUB),
        grid=(tiles // SUB,),
        in_specs=[
            pl.BlockSpec((8 * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows * SUB, RAY_TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * tiles, RAY_TILE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k32 // 32, RAY_TILE), jnp.int32)],
        interpret=interpret,
    )(rays_lane, child)
    out = out.reshape(tiles, rows, RAY_TILE).transpose(0, 2, 1)
    out = out.reshape(n_pad, rows)
    return out[:, :w_slots], out[:, w_slots] > 0


def _leaf_call(cs: ClusterScene, ids_blk, valid_blk, prcol, t0, watertight,
               interpret):
    p_pad = prcol.shape[0]
    n_blocks = p_pad // RAY_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # ids_blk, valid_blk
        grid=(n_blocks // BPS,),
        in_specs=[
            pl.BlockSpec((BPS * RAY_TILE, 8), lambda i, ids, vld: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(
                (TRI_ROWS, LANE_TRIS),
                partial(lambda b, i, ids, vld: (ids[i * BPS + b], 0), b),
                memory_space=pltpu.VMEM,
            )
            for b in range(BPS)
        ],
        out_specs=pl.BlockSpec((BPS * RAY_TILE, 1), lambda i, ids, vld: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    keys = pl.pallas_call(
        partial(_leaf_kernel, BPS, t0, watertight),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.int32),
        interpret=interpret,
    )(ids_blk, valid_blk, prcol, *([cs.tri] * BPS))
    return keys[:, 0]


@partial(jax.jit, static_argnames=("t0", "watertight", "interpret", "w"))
def _binned_core(cs: ClusterScene, ro, rd, t1v, t0, watertight, interpret, w):
    """-> (kmin (n_pad,) packed keys, cwin (n_pad,) winning cluster,
    overflow (n_pad,) bool). Rays padded to a 128*SUB multiple by caller."""
    n_pad = ro.shape[0]
    k = cs.n_clusters
    lane, cols = _pack_rays(ro, rd, t1v)
    ids, ovf = _prepass_call(cs, lane, t0, w, interpret)

    flat = ids.reshape(-1)                          # (P,) ray-major
    p = flat.shape[0]
    perm = jnp.argsort(flat)                        # sentinels last
    sids = jnp.minimum(flat[perm], k)               # sentinel bucket = k
    # per-cluster segment offsets/counts from the sorted ids (no scatter)
    coff = jnp.searchsorted(sids, jnp.arange(k + 1, dtype=jnp.int32)
                            ).astype(jnp.int32)     # (k+1,): coff[k] = P_real
    cnt = jnp.diff(coff)                            # (k,) pairs per cluster
    # block-padded layout: cluster j's pairs at boff[j], padded to 128s
    bcnt = -(-cnt // RAY_TILE) * RAY_TILE
    boff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bcnt).astype(jnp.int32)]
    )                                               # (k+1,)
    p_pad = -(-(p + k * RAY_TILE) // (BPS * RAY_TILE)) * (BPS * RAY_TILE)
    n_blocks = p_pad // RAY_TILE
    bstart = jnp.arange(n_blocks, dtype=jnp.int32) * RAY_TILE
    jblk = (jnp.searchsorted(boff, bstart, side="right") - 1).astype(jnp.int32)
    valid_blk = jblk < k
    ids_blk = jnp.where(valid_blk, jblk, 0).astype(jnp.int32)
    vld_blk = valid_blk.astype(jnp.int32)

    # padded slot -> source pair -> ray; intra-block pads get dead rays
    jslot = jnp.repeat(jblk, RAY_TILE)              # (p_pad,)
    jslot_c = jnp.minimum(jslot, k - 1)
    rank = jnp.arange(p_pad, dtype=jnp.int32) - boff[jslot_c]
    src_ok = (jslot < k) & (rank < cnt[jslot_c])
    src = jnp.where(src_ok, coff[jslot_c] + rank, 0)
    pray = perm[src] // w
    prcol = cols[pray]                              # (p_pad, 8)
    # dead out-of-segment slots: t1 = 0 rejects every triangle
    prcol = jnp.where(src_ok[:, None], prcol, 0.0)

    keys_pad = _leaf_call(cs, ids_blk, vld_blk, prcol, t0, watertight,
                          interpret)

    # back to ray-major: slot s of ray r sits at boff[id] + (sorted pos
    # within its cluster segment)
    inv = jnp.zeros((p,), jnp.int32).at[perm].set(
        jnp.arange(p, dtype=jnp.int32))
    idc = jnp.minimum(flat, k - 1)
    real = flat < k
    ppos = jnp.where(real, boff[idc] + (inv - coff[idc]), 0)
    key_s = jnp.where(real, keys_pad[ppos], MISS_KEY)
    keymat = key_s.reshape(n_pad, w)
    kmin = jnp.min(keymat, axis=1)
    amin = jnp.argmin(keymat, axis=1)
    cwin = jnp.take_along_axis(ids, amin[:, None], axis=1)[:, 0]
    return kmin, cwin, ovf


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
    (hit, t, face) with the same <= 2^-17 packed-t rounding. Needs no
    coherence sort — performance is wavefront-order independent. Overflow
    rays (> W_SLOTS candidate clusters, the p99 tail) are re-traced
    exactly by the tile sweep under a lax.cond that costs nothing when no
    ray overflows. Off-TPU (and not interpreting) routes to the pure-JAX
    oracle like the sweep does."""
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import closest_hit_ref

        hit, t, slot = closest_hit_ref(cs, ro, rd, t0, t1,
                                       watertight=watertight)
        return hit, t, slot_to_face(cs, slot).astype(jnp.int32)
    ro_p, rd_p, t1v, n = _pad_rays(ro, rd, t1)
    kmin, cwin, ovf = _binned_core(cs, ro_p, rd_p, t1v, float(t0),
                                   watertight, interpret, W_SLOTS)
    kmin, cwin, ovf = kmin[:n], cwin[:n], ovf[:n]
    hit = kmin < MISS_KEY
    t = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(kmin, ~jnp.int32(127)), jnp.float32
    )
    slot = jnp.where(hit, cwin * LANE_TRIS + jnp.bitwise_and(kmin, 127), -1)

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
    ro_p, rd_p, t1v, n = _pad_rays(ro, rd, t1)
    kmin, _, ovf = _binned_core(cs, ro_p, rd_p, t1v, float(t0),
                                watertight, interpret, W_SLOTS)
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
