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
  2. SORT (XLA): one 2-array lax.sort bins the (bin, slot) pairs by bin
     id (the source ray derives from the slot). Empty slots carry a
     sentinel key and sink to the end — so the leaf stage then runs over
     the smallest static PREFIX of the sorted stream that holds every
     real pair (_tier_caps: one element compare per tier, lax.switch).
     Real pairs are typically a small fraction of the N*W slot table,
     and the (P, 8) ray-columns gather was the single biggest glue item
     before tiering (16.5 ms of a 50 ms query at N=262k, measured).
  3. LEAF (Pallas): per 128-pair block, iterate the block's DISTINCT bin
     ids (sorted, so typically one) with a masked while-loop: one scalar
     extract per distinct bin, then the bin's 4 clusters run the dense
     (128 pairs x 128 tris) Moeller-Trumbore/watertight chunks straight
     off the VMEM-resident (K*16, 128) triangle table, with per-pair t1
     bounds and 2 extra key bits for the cluster within the bin.
     All-sentinel blocks exit after one extract; all-sentinel grid steps
     after one.
  4. REDUCE (XLA): per-ray closest hit via two cap-sized scatter-mins
     (_reduce_pairs: kmin scatter-min, then a tag pass for the winning
     bin) — the round-4 inverse-permutation unsort to an (N, W) table
     cost ~19 ms at P=1.57M on chip. Overflow rays (> W_SLOTS crossing
     bins, the p95+ tail) re-trace exactly through the tile sweep under
     a lax.cond that costs nothing when none overflow.

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
_W_DEFAULT = 6
W_SLOTS = int(os.environ.get("PYRENDERER_BINNED_W", str(_W_DEFAULT)))

# streamed-path W default: the peel-round residual makes overflow cost a
# FULL extra round (sort + gathers + leaf), so a wider first round pays.
# Chip W sweep (same session, round 5): 32k shuffled rays, terrain100k
# 36.0/30.9/39.0 ms at W=6/10/14; terrain500k 69.8/66.8/84.8 -> W=10.
W_SLOTS_STREAMED = 10


def _w_slots(streamed: bool = False) -> int:
    """Per-call read of the W knob (ADVICE r4: the import-time-only read
    silently ignored env changes mid-process). Priority: env var, then a
    monkeypatched W_SLOTS (tests force tiny W to exercise the overflow
    paths), then the per-mode default."""
    env = os.environ.get("PYRENDERER_BINNED_W")
    if env is not None:
        return int(env)
    if W_SLOTS != _W_DEFAULT:      # monkeypatched by a test/harness
        return W_SLOTS
    return W_SLOTS_STREAMED if streamed else W_SLOTS


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


def _peel_slots(ws, rowi, n_words, w_slots, emit):
    """Peel the first `w_slots` set bits per ray (lane) from the
    (n_words, 128) crossing-word grid, ascending bin order. emit(slot,
    cid) receives each (1, 128) id row (SENTINEL where a ray has no more
    bits). Returns (remaining words, (1, 128) leftover word count) —
    leftover > 0 is the per-ray overflow flag AND the input to the next
    peel round of the streamed residual (kernels can resume peeling from
    the returned words with zero recomputation of the slab tests)."""
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
        emit(slot, cid)
        cleared = jnp.bitwise_and(cand, cand - 1)
        ws = jnp.where(rowi == first, cleared, ws)
    leftover = jnp.sum(
        jnp.where(ws != 0, 1, 0).astype(jnp.int32), axis=0, keepdims=True
    )
    return ws, leftover


def _prepass_kernel(n_words, w_slots, t0, sub, emit_words, rays_ref, box_ref,
                    *outs):
    """Per 128-ray tile: slab-test all KB bin boxes (8 per step, rays in
    lanes), pack per-ray crossing bits into (n_words, 128) VMEM scratch,
    then peel the first `w_slots` set bits per ray into candidate ids.

    out rows per sub-tile: w_slots id rows then one overflow row. With
    emit_words (the streamed path), the post-peel words are ALSO written
    out so the residual rounds can continue peeling without re-running
    the slab tests."""
    if emit_words:
        out_ref, words_out, words_ref = outs
    else:
        out_ref, words_ref = outs
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

        def emit(slot, cid):
            out_ref[pl.ds(st * (w_slots + 1) + slot, 1), :] = cid

        ws, leftover = _peel_slots(
            words_ref[...], rowi, n_words, w_slots, emit
        )
        out_ref[pl.ds(st * (w_slots + 1) + w_slots, 1), :] = leftover
        if emit_words:
            words_out[pl.ds(st * n_words, n_words), :] = ws
        return 0

    jax.lax.fori_loop(0, sub, sub_tile, 0)


def _peel_kernel(n_words, w_slots, sub, words_in, out_ref, words_out):
    """Residual-round candidate extraction: resume peeling w_slots MORE
    candidate bins per ray from the carried crossing words (no slab
    recomputation). Same output layout as the prepass."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_words, RAY_TILE), 0)

    def sub_tile(st, _):
        ws = words_in[pl.ds(st * n_words, n_words), :]

        def emit(slot, cid):
            out_ref[pl.ds(st * (w_slots + 1) + slot, 1), :] = cid

        ws, leftover = _peel_slots(ws, rowi, n_words, w_slots, emit)
        out_ref[pl.ds(st * (w_slots + 1) + w_slots, 1), :] = leftover
        words_out[pl.ds(st * n_words, n_words), :] = ws
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
                # carry outputs promote back to the carry inputs' varying
                # axes: under shard_map(check_vma) the kernel-internal
                # where/min results otherwise come out UNVARYING and the
                # while_loop rejects the carry (found by running the
                # compiled kernel inside a checked 1-device chip mesh)
                cv = vma.args_vma(m, rem, best)
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
                return (vma.promote(jnp.min(rem), cv),
                        vma.promote(rem, cv), vma.promote(best, cv))

            # best derives from idr (not a fresh constant) so that under
            # a vma-checked shard_map it carries the same varying type
            # the loop body produces (cf. accel/clusters closest_hit_ref)
            init = (
                jnp.min(idr),
                idr,
                jnp.full_like(idr, MISS_KEY),
            )
            _, _, best = jax.lax.while_loop(
                lambda c: c[0] != SENTINEL, body, init
            )
            out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = best
            return 0

        jax.lax.fori_loop(0, bps, block, 0)


def _ids_unpack(out, tiles, rows, w_slots):
    n_pad = tiles * RAY_TILE
    out = out.reshape(tiles, rows, RAY_TILE).transpose(0, 2, 1)
    out = out.reshape(n_pad, rows)
    return out[:, :w_slots], out[:, w_slots] > 0


def _prepass_call(cs: ClusterScene, rays_lane, t0, w_slots, interpret,
                  emit_words=False):
    """-> (ids (n_pad, W) int32 ascending-per-ray, overflow (n_pad,) bool
    [, words (tiles * n_words, 128) int32 — remaining crossing bits, for
    the streamed residual rounds])."""
    kb32 = cs.bin_box.shape[0]
    n_words = kb32 // 32
    n_pad = rays_lane.shape[0] // 8 * RAY_TILE
    tiles = n_pad // RAY_TILE
    rows = w_slots + 1
    v = vma.args_vma(rays_lane)
    out_specs = [pl.BlockSpec((rows * SUB, RAY_TILE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [vma.struct((rows * tiles, RAY_TILE), jnp.int32, v)]
    if emit_words:
        out_specs.append(
            pl.BlockSpec((n_words * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            vma.struct((n_words * tiles, RAY_TILE), jnp.int32, v)
        )
    res = pl.pallas_call(
        partial(_prepass_kernel, n_words, w_slots, t0, SUB, emit_words),
        grid=(tiles // SUB,),
        in_specs=[
            pl.BlockSpec((8 * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if emit_words else out_specs[0],
        out_shape=out_shape if emit_words else out_shape[0],
        scratch_shapes=[pltpu.VMEM((n_words, RAY_TILE), jnp.int32)],
        interpret=interpret,
    )(rays_lane, vma.promote(cs.bin_box, v))
    out = res[0] if emit_words else res
    ids, ovf = _ids_unpack(out, tiles, rows, w_slots)
    if emit_words:
        return ids, ovf, res[1]
    return ids, ovf


def _peel_call(cs: ClusterScene, words, w_slots, interpret):
    """Next w_slots candidate bins per ray from carried crossing words.
    -> (ids, overflow, words) like _prepass_call(emit_words=True)."""
    kb32 = cs.bin_box.shape[0]
    n_words = kb32 // 32
    tiles = words.shape[0] // n_words
    rows = w_slots + 1
    v = vma.args_vma(words)
    ids_out, words_out = pl.pallas_call(
        partial(_peel_kernel, n_words, w_slots, SUB),
        grid=(tiles // SUB,),
        in_specs=[
            pl.BlockSpec((n_words * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_words * SUB, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            vma.struct((rows * tiles, RAY_TILE), jnp.int32, v),
            vma.struct((n_words * tiles, RAY_TILE), jnp.int32, v),
        ],
        interpret=interpret,
    )(words)
    ids, ovf = _ids_unpack(ids_out, tiles, rows, w_slots)
    return ids, ovf, words_out


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


# ---------------------------------------------------------------------------
# HBM-streamed leaf path: no VMEM scene ceiling
# ---------------------------------------------------------------------------
#
# The resident leaf (above) holds the whole (K*16, 128) triangle table in
# VMEM — fast, but capped at ~220k triangles on v5e (pallas_cluster
# _check_vmem). The streamed variant below restores binned-v1's design
# (round-4 commit 50c9dd8, dropped in the v3 rework): the pair stream is
# re-padded so every 128-pair block belongs to ONE bin, and each block's
# (BIN*16, 128) triangle rows arrive via a scalar-prefetched BlockSpec
# index_map — Mosaic DMAs exactly the bins the sorted stream visits from
# HBM, double-buffered across grid steps by the normal Pallas pipeline.
# Only the bin boxes (prepass) and the in-flight triangle blocks occupy
# VMEM, so scene size is bounded by HBM (~16 GB), like the reference's
# device-global-memory scenes (bvh_taichi.py:116-124, World.commit
# intersection_taichi.py:189-236) and unlike every resident kernel here.
#
# Exactness without the sweep: overflow rays (> W crossing bins) cannot
# re-trace through the VMEM-resident sweep (the scene may not fit), so the
# streamed path carries the prepass's remaining crossing words and keeps
# peeling W more bins per ray per round (_peel_kernel) inside a
# lax.while_loop until no ray has bits left — every crossed bin is tested
# exactly once, in ascending bin order.

BPS_S = 8          # pair blocks per streamed leaf grid step


def _leaf_kernel_streamed(bps, t0, watertight, ids_ref, valid_ref, rcol_ref,
                          *tri_and_out):
    """Per grid step: `bps` single-bin 128-pair blocks. Block b's bin
    triangles arrive pre-DMA'd from HBM via the scalar-prefetched
    index_map (tri_and_out[b]); the bin's BIN clusters run the dense
    column-form leaf chunks, packed-key output. No while-loops, no
    scalar extracts — the sort already made every decision."""
    tri_refs = tri_and_out[:bps]
    out_ref = tri_and_out[bps]
    step = pl.program_id(0)
    f = _leaf_wt_chunk if watertight else _leaf_mt_chunk
    from pyrenderer_tpu.accel.clusters import TRI_ROWS

    for b in range(bps):
        out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = jnp.full(
            (RAY_TILE, 1), MISS_KEY, jnp.int32
        )

        @pl.when(valid_ref[step * bps + b] > 0)
        def _(b=b):
            rcol = rcol_ref[pl.ds(b * RAY_TILE, RAY_TILE), :]
            oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])
            dc = (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])
            t1c = rcol[:, 6:7]
            cand = jnp.full((RAY_TILE, 1), MISS_KEY, jnp.int32)
            for ci in range(BIN):
                blk = tri_refs[b][pl.ds(ci * TRI_ROWS, TRI_ROWS), :]
                key7 = f(blk, oc, dc, t0, t1c)
                key9 = jnp.bitwise_or(
                    jnp.bitwise_and(key7, ~jnp.int32(_LOW)),
                    jnp.bitwise_or(
                        jnp.int32(ci << 7),
                        jnp.bitwise_and(key7, jnp.int32(127)),
                    ),
                )
                cand = jnp.minimum(cand, key9)
            out_ref[pl.ds(b * RAY_TILE, RAY_TILE), :] = cand


def _leaf_call_streamed(cs: ClusterScene, ids_blk, valid_blk, prcol, t0,
                        watertight, interpret):
    from pyrenderer_tpu.accel.clusters import TRI_ROWS

    p_pad = prcol.shape[0]
    n_blocks = p_pad // RAY_TILE
    v = vma.args_vma(ids_blk, valid_blk, prcol)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # ids_blk, valid_blk
        grid=(n_blocks // BPS_S,),
        in_specs=[
            pl.BlockSpec((BPS_S * RAY_TILE, 8), lambda i, ids, vld: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(
                (BIN * TRI_ROWS, LANE_TRIS),
                partial(lambda b, i, ids, vld: (ids[i * BPS_S + b], 0), b),
                memory_space=pltpu.VMEM,
            )
            for b in range(BPS_S)
        ],
        out_specs=pl.BlockSpec((BPS_S * RAY_TILE, 1),
                               lambda i, ids, vld: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    keys = pl.pallas_call(
        partial(_leaf_kernel_streamed, BPS_S, t0, watertight),
        grid_spec=grid_spec,
        out_shape=vma.struct((p_pad, 1), jnp.int32, v),
        interpret=interpret,
    )(ids_blk, valid_blk, prcol, *([vma.promote(cs.tri, v)] * BPS_S))
    return keys[:, 0]


def _blockified_leaf(cs: ClusterScene, sortd_c, perm_c, cols, t0,
                     watertight, interpret, w):
    """Streamed leaf over a (cap,) prefix of the sorted pair stream: pad
    each bin's run to whole 128-pair blocks (so a block's bin is known to
    the prefetched index_map), stream the leaf, and map the padded keys
    back to SORTED-position order. Returns (cap,) keys."""
    cap = sortd_c.shape[0]
    kb = cs.n_clusters // BIN
    # per-bin segment offsets (sentinels land in bucket kb, no blocks)
    sids = jnp.minimum(sortd_c, kb)
    coff = jnp.searchsorted(
        sids, jnp.arange(kb + 1, dtype=jnp.int32)
    ).astype(jnp.int32)                              # (kb+1,)
    cnt = jnp.diff(coff)                             # (kb,) pairs per bin
    bcnt = -(-cnt // RAY_TILE) * RAY_TILE            # block-padded
    boff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bcnt).astype(jnp.int32)]
    )                                                # (kb+1,)
    # static worst case: every nonempty bin wastes < RAY_TILE slots
    p_pad = -(-(cap + kb * (RAY_TILE - 1)) // (BPS_S * RAY_TILE)) * (
        BPS_S * RAY_TILE)
    n_blocks = p_pad // RAY_TILE
    bstart = jnp.arange(n_blocks, dtype=jnp.int32) * RAY_TILE
    jblk = (jnp.searchsorted(boff, bstart, side="right") - 1).astype(
        jnp.int32)
    jblk = jnp.minimum(jblk, kb)                     # past-the-end -> kb
    valid_blk = (jblk < kb).astype(jnp.int32)
    ids_blk = jnp.minimum(jblk, kb - 1)

    # padded slot -> source sorted pair -> ray columns
    slot_i = jnp.arange(p_pad, dtype=jnp.int32)
    jslot = jnp.take(jblk, slot_i // RAY_TILE)
    jsc = jnp.minimum(jslot, kb - 1)
    rank = slot_i - jnp.take(boff, jsc)
    src_ok = (jslot < kb) & (rank < jnp.take(cnt, jsc))
    src = jnp.where(src_ok, jnp.take(coff, jsc) + rank, 0)
    pray = jnp.take(perm_c, src) // w
    prcol = jnp.where(
        src_ok[:, None], jnp.take(cols, pray, axis=0), 0.0
    )                                                # (p_pad, 8)

    keys_pad = _leaf_call_streamed(cs, ids_blk, valid_blk, prcol, t0,
                                   watertight, interpret)

    # padded keys back to sorted-position order: sorted pair q of bin j
    # sits at padded position boff[j] + (q - coff[j])
    qi = jnp.arange(cap, dtype=jnp.int32)
    real_q = sortd_c != SENTINEL
    idq = jnp.minimum(sortd_c, kb - 1)
    pposq = jnp.where(
        real_q, jnp.take(boff, idq) + (qi - jnp.take(coff, idq)), 0
    )
    return jnp.where(real_q, jnp.take(keys_pad, pposq), MISS_KEY)


def _trace_round_streamed(cs: ClusterScene, ids, cols, t0, watertight,
                          interpret, w):
    """One streamed trace of an (n_pad, w) candidate table: sort pairs by
    bin, run the blockified streamed leaf over the smallest adequate
    sorted-stream prefix (tiered like the resident path), unsort.
    -> (kmin (n_pad,) packed keys, binwin (n_pad,))."""
    n_pad = ids.shape[0]
    flat = ids.reshape(-1)                           # (P,) ray-major
    p = flat.shape[0]
    iota = jnp.arange(p, dtype=jnp.int32)
    sortd, perm = jax.lax.sort([flat, iota], num_keys=1)

    caps = _tier_caps(n_pad, p, RAY_TILE)

    def make_branch(cap):
        def br(_):
            keys_c = _blockified_leaf(cs, sortd[:cap], perm[:cap], cols,
                                      t0, watertight, interpret, w)
            return _reduce_pairs(keys_c, sortd[:cap], perm[:cap], n_pad, w)
        return br

    if len(caps) == 1:
        return make_branch(p)(None)
    covered = [sortd[c] == SENTINEL for c in caps[:-1]]
    sel = jnp.int32(len(caps) - 1)
    for i in range(len(caps) - 2, -1, -1):
        sel = jnp.where(covered[i], jnp.int32(i), sel)
    return jax.lax.switch(sel, [make_branch(c) for c in caps], None)


@partial(jax.jit, static_argnames=("t0", "watertight", "interpret", "w"))
def _binned_core_streamed(cs: ClusterScene, ro, rd, t1v, t0, watertight,
                          interpret, w):
    """Streamed binned closest-hit core: exact with NO VMEM scene
    residency. Overflow rays keep peeling w more candidate bins per round
    (carried crossing words, no slab recomputation) until none remain.
    -> (kmin (n_pad,) packed keys, binwin (n_pad,))."""
    lane, cols = _pack_rays(ro, rd, t1v)
    ids, ovf, words = _prepass_call(cs, lane, t0, w, interpret,
                                    emit_words=True)
    kmin, binwin = _trace_round_streamed(cs, ids, cols, t0, watertight,
                                         interpret, w)

    def cond(c):
        return jnp.any(c[2])

    def body(c):
        kmin, binwin, ovf, words = c
        ids2, ovf2, words2 = _peel_call(cs, words, w, interpret)
        k2, b2 = _trace_round_streamed(cs, ids2, cols, t0, watertight,
                                       interpret, w)
        better = k2 < kmin
        return (jnp.minimum(kmin, k2), jnp.where(better, b2, binwin),
                ovf2, words2)

    kmin, binwin, _, _ = jax.lax.while_loop(
        cond, body, (kmin, binwin, ovf, words)
    )
    return kmin, binwin


def _reduce_pairs(keys_c, sortd_c, perm_c, n_pad, w):
    """Per-ray closest-hit reduction over a (cap,) sorted pair prefix —
    WITHOUT any P-sized unsort. The round-4 unsort (inverse-permutation
    scatter + P-sized gather + (N, W) reshape/argmin) cost ~19 ms at
    P=1.57M on chip; two cap-sized scatter-mins and one flat gather do
    the same job:

      kmin[ray]   = min over the ray's pair keys (scatter-min);
      binwin[ray] = min bin id among pairs achieving kmin (tag pass) —
                    the same tie-break as the old per-ray argmin over
                    ascending-bin candidate slots.
    """
    ray_c = perm_c // w
    kmin = jnp.full((n_pad,), MISS_KEY, jnp.int32).at[ray_c].min(keys_c)
    kk = jnp.take(kmin, ray_c)                       # (cap,) flat gather
    tag = jnp.where(keys_c == kk, sortd_c, jnp.int32(SENTINEL))
    binwin = jnp.full((n_pad,), SENTINEL, jnp.int32).at[ray_c].min(tag)
    return kmin, binwin


def _tier_caps(n_pad, p_full, unit):
    """Static leaf-stage tiers: smallest prefix of the sorted pair stream
    that could hold all real pairs wins (one scalar compare each). Real
    pairs are typically a small fraction of the N*W slot table — bounce
    wavefronts average ~1 candidate bin/ray — so running the gather +
    leaf over the full slot table wastes most of its work on sentinels
    (measured: the (1.57M, 8) ray-columns gather alone cost 16.5 ms of a
    50 ms query before tiering, perf/RESULTS.md round 5)."""
    caps = []
    for c in (n_pad // 2, 2 * n_pad):
        c = -(-c // unit) * unit
        if c < p_full and c not in caps:
            caps.append(c)
    return caps + [p_full]


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
    p_full = p + pad
    iota = jnp.arange(p_full, dtype=jnp.int32)
    # 2-array sort; the source ray is derived from the carried slot index
    # (the round-4 3-array sort carried iota // w redundantly)
    sortd, perm = jax.lax.sort([flat, iota], num_keys=1)

    # tiered leaf stage: gather + leaf only over the smallest static
    # prefix that holds every real pair (sentinels sort last, so ONE
    # element compare per tier decides coverage)
    caps = _tier_caps(n_pad, p_full, BPS * RAY_TILE)

    def make_branch(cap):
        def br(_):
            prcol = jnp.take(cols, perm[:cap] // w, axis=0)
            keys_c = _leaf_call(cs, sortd[:cap], prcol, t0, watertight,
                                interpret)
            return _reduce_pairs(keys_c, sortd[:cap], perm[:cap], n_pad, w)
        return br

    if len(caps) == 1:
        kmin, binwin = make_branch(p_full)(None)
    else:
        covered = [sortd[c] == SENTINEL for c in caps[:-1]]
        sel = jnp.int32(len(caps) - 1)
        for i in range(len(caps) - 2, -1, -1):
            sel = jnp.where(covered[i], jnp.int32(i), sel)
        kmin, binwin = jax.lax.switch(
            sel, [make_branch(c) for c in caps], None
        )
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
                interpret=False, streamed=False, exact_t=True):
    """Binned closest hit: same contract as pallas_cluster.closest_hit
    (hit, t, face), including exact f32 t (the in-kernel <= 2^-14 packed
    rounding is undone at the boundary via exact_t_for_slot). Needs no
    coherence sort — performance is wavefront-order independent.

    streamed=False (default): triangle table VMEM-resident; overflow rays
    (> W_SLOTS crossing bins) re-trace exactly through the tile sweep
    under a lax.cond that costs nothing when no ray overflows.

    streamed=True: triangle bins DMA from HBM via prefetched index maps —
    NO VMEM scene ceiling (the resident paths cap at ~220k triangles on
    v5e); overflow rays instead keep peeling more candidate bins per
    round until none remain (see the streamed section above). This is
    the auto-selected path for caller-built monolithic oversize scenes
    (core.integrator.resolve_backend -> "cluster_streamed"); chip-
    verified to compile and run inside a shard_map(check_vma) mesh.

    Known limit: the RESIDENT kernel's distinct-bin while-loop trips a
    carry-vma inconsistency when compiled inside a checked shard_map
    (jax 0.9 pallas-in-shard_map typing; probed on chip round 5) — the
    integrator never routes it there (dist/render remaps cluster_binned
    to the sweep inside meshes), and standalone/streamed use is
    unaffected.

    Off-TPU (and not interpreting) routes to the pure-JAX oracle like the
    sweep does."""
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import closest_hit_ref

        hit, t, slot = closest_hit_ref(cs, ro, rd, t0, t1,
                                       watertight=watertight)
        return hit, t, slot_to_face(cs, slot).astype(jnp.int32)
    if not streamed:
        _check_vmem(cs, "binned")
    ro_p, rd_p, t1v, n = _pad_rays(ro, rd, t1)
    if streamed:
        kmin, binwin = _binned_core_streamed(
            cs, ro_p, rd_p, t1v, float(t0), watertight, interpret,
            _w_slots(streamed=True))
        kmin, binwin = kmin[:n], binwin[:n]
        ovf = None                        # rounds already made it exact
    else:
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
    if exact_t:
        # undo the packed <= 2^-14 rounding; exact_t=False skips the
        # 9-gather re-derivation for callers that re-derive hit geometry
        # themselves (the integrator does)
        from pyrenderer_tpu.accel.clusters import exact_t_for_slot

        t = exact_t_for_slot(cs, slot, ro, rd, t)
    face = slot_to_face(cs, slot).astype(jnp.int32)
    if streamed:
        return hit, jnp.where(hit, t, 0.0), face

    def with_residual(_):
        from pyrenderer_tpu.kernels import pallas_cluster as pc

        t1r = jnp.where(ovf, t1v[:n], 0.0)
        return pc.closest_hit(cs, ro, rd, t0, t1r, sort=False,
                              watertight=watertight, interpret=interpret,
                              exact_t=exact_t)

    def no_residual(_):
        return (
            jnp.zeros((n,), bool),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.int32),
        )

    h2, t2, f2 = jax.lax.cond(jnp.any(ovf), with_residual, no_residual, None)
    hit_f = jnp.where(ovf, h2, hit)
    t_f = jnp.where(ovf, t2, jnp.where(hit, t, 0.0))
    face_f = jnp.where(ovf, f2, face)
    return hit_f, t_f, face_f


def occluded(cs: ClusterScene, ro, rd, t0, t1, watertight=False,
             interpret=False, streamed=False):
    """Binned any-hit: True where something lies in (t0, t1). Shadow rays
    carry bounded t1, so their candidate sets are the smallest of all
    query types; a hit found by the bounded closest-hit machinery IS an
    occlusion, and a miss proves clearance. streamed=True as in
    closest_hit (HBM-streamed bins, peel-round residual, no VMEM
    ceiling)."""
    ro, rd, t1 = jax.lax.stop_gradient((ro, rd, t1))
    if not interpret and jax.default_backend() != "tpu":
        from pyrenderer_tpu.accel.clusters import occluded_ref

        return occluded_ref(cs, ro, rd, t0, t1, watertight=watertight)
    if streamed:
        ro_p, rd_p, t1v, n = _pad_rays(ro, rd, t1)
        kmin, _ = _binned_core_streamed(cs, ro_p, rd_p, t1v, float(t0),
                                        watertight, interpret,
                                        _w_slots(streamed=True))
        return kmin[:n] < MISS_KEY
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
