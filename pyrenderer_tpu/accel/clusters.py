"""Cluster two-level acceleration structure — the TPU-native "BVH".

Large scenes cannot use the whole-table kernels (kernels/pallas_intersect.py
holds all triangles in SMEM — O(T) work and a hard SMEM ceiling), and a
per-ray stackless pointer-chase (accel/bvh.py traverse, the shape of the
reference's intersection_taichi.py:256-287 walk) is hostile to the TPU's
8x128 vector unit: every ray diverges, every node fetch is a scalar gather.

This module re-designs the accelerator around what the hardware does well:

  - triangles are partitioned by recursive largest-axis median split
    into CLUSTERS of 128 — one cluster = one VPU lane row, so a cluster
    leaf test is a dense (rays x 128) Moeller-Trumbore at full vector
    width (median split replaced the round-2 Morton slabs: tighter boxes,
    measured 1.6x fewer-visit traversals on terrain100k);
  - 16 clusters form a SUPERCLUSTER; both levels carry AABBs. Traversal
    is a lockstep sweep: a ray TILE tests the supercluster box (vector,
    per-ray), a scalar any() decides whether the whole tile descends, and
    the same trick prunes each child cluster. Skipped groups cost one
    scalar branch — no per-ray pointer chasing, no gathers;
  - per-ray running t-bounds feed back into the cull, so far geometry is
    skipped exactly like a BVH's ordered traversal prunes;
  - rays are coherence-sorted before the sweep (sort_keys: origin Morton
    cell major, 9-bit quantized direction minor, dead lanes last) when
    the scene is large enough for the sort glue to pay — a tile then
    touches few superclusters (RenderConfig.cluster_sort="auto").

The reference analog of the *build* is bvh_taichi.py:69-104 (median split +
escape pointers); here the same median-split idea yields a flat two-level
layout instead of a pointer tree. The *leaf test* is the batch
Moeller-Trumbore of mathematics/intersection.py:68-82, at (rays, 128) tile
granularity.

Build runs on host NumPy at scene-load time (like World.commit in the
reference); the traversal kernel lives in kernels/pallas_cluster.py with a
pure-JAX twin here (`closest_hit_ref`) as the CPU/correctness oracle.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyrenderer_tpu.accel.bvh import GAMMA2_3

LANE_TRIS = 128   # triangles per cluster = VPU lane width
GROUP = 16        # clusters per supercluster
TRI_ROWS = 16     # rows per cluster in the packed (K*16, 128) table (9 used)
BIN = int(__import__("os").environ.get("PYRENDERER_BIN", "4"))
                  # clusters per BIN (kernels/pallas_binned pair granularity:
                  # default 4 x 128 = 512 triangles — adjacent clusters are
                  # median-split siblings, so a bin's box is tight). Env
                  # knob (import-time, perf harness only): PYRENDERER_BIN=1
                  # measures the 128-triangle two-level-stream granularity
                  # (perf/binnedgran.py) — a ClusterScene must be built and
                  # traversed under the SAME value

MISS_T = 3.0e38


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterScene:
    """Device-ready clustered geometry.

    K = padded cluster count (multiple of GROUP), S = K // GROUP.
    Padded clusters and padded supercluster rows carry all-NaN AABBs:
    every slab comparison against NaN is false, so the cull REALLY fails
    (an inverted min=+inf/max=-inf box would pass, because the slab test
    re-sorts lo/hi per axis — verified empirically). Padded triangle
    slots in a PARTIALLY-filled real cluster duplicate the last sorted
    face (harmless: a duplicate hit is the same surface at the same t);
    only fully-padded clusters are zero-filled, and those are already
    masked by their NaN boxes.
    """

    tri: jnp.ndarray         # (K * TRI_ROWS, 128) f32 — rows v0|e1|e2 (9) + pad
    child_box: jnp.ndarray   # (K + GROUP, 128) f32 — one row per cluster,
                             # lanes bmin.xyz|bmax.xyz (6 used; children of
                             # supercluster s are rows s*GROUP..s*GROUP+15,
                             # so the kernel's (GROUP, 128) slice has
                             # children in sublanes and broadcasts against
                             # rays in lanes). The trailing GROUP rows are
                             # all-NaN: the children of the DUMMY
                             # supercluster id K//GROUP, used by the
                             # kernel's pair-peeled sweep when a visit pops
                             # only one real supercluster (dummy_super)
    bin_box: jnp.ndarray     # (KB_pad32, 128) f32 — one row per BIN of 4
                             # adjacent clusters (512 tris), lanes 0..5 =
                             # bmin|bmax, rows padded to a 32-multiple with
                             # NaN boxes (the binned prepass's box table)
    super_box: jnp.ndarray   # (6, S) f32 — bmin.xyz|bmax.xyz columns per supercluster
    super_cols: jnp.ndarray  # (S_pad, 128) f32 — same boxes, one row per
                             # supercluster with comps in lanes 0..5, S
                             # padded to a 32-multiple (inverted boxes) for
                             # the kernel's dense prepass + bit packing
    bitw: jnp.ndarray        # (S_pad, 1) i32 — 1 << (s % 32) bit weights
    order: jnp.ndarray       # (K * 128,) i32 — packed slot -> original face id
    world_lo: jnp.ndarray    # (3,) f32 scene AABB (for ray-sort quantization)
    world_inv_span: jnp.ndarray  # (3,) f32

    @property
    def n_superclusters(self) -> int:
        return self.super_box.shape[1]

    @property
    def n_clusters(self) -> int:
        return self.tri.shape[0] // TRI_ROWS

    @property
    def dummy_super(self) -> int:
        """Supercluster id whose GROUP children are the trailing all-NaN
        rows of child_box — a safe no-op second operand for the kernel's
        pair-peeled visits."""
        return self.n_clusters // GROUP


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterChunks:
    """A VMEM-oversize scene as a tuple of resident-sized ClusterScenes.

    Round-5 capacity A/B (perf/chunkedsweep.py, chip, same session):
    sweeping the chunks SEQUENTIALLY with the running per-ray t-bound
    carried between them beats the HBM-streamed binned traversal 2.9x at
    330k tris (3.7 vs 10.9 ms / 32k shuffled rays) and 4.1x at 500k
    (3.9 vs 16.1 ms), exact hit agreement — each chunk's tables stay
    VMEM-resident during its sweep, so the only extra cost vs a (refused)
    monolithic sweep is the per-chunk dense prepass, while streaming pays
    HBM latency per leaf. Chunks are padded to EQUAL triangle counts
    (degenerate zero faces, same trick as dist/geometry
    build_shard_clusters) so every chunk shares ONE compiled kernel.
    """

    chunks: tuple   # tuple[ClusterScene, ...], equal shapes
    faces_per_chunk: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )               # chunk i holds global faces [i*fpc, (i+1)*fpc)

    @property
    def n_clusters(self) -> int:
        """Total clusters (drives the sort/watertight auto policies)."""
        return sum(c.n_clusters for c in self.chunks)


# Largest per-chunk triangle count: ~180k tris of cluster tables is
# ~10.6 MiB of tables per chunk. The v5e scoped-VMEM budget is ~16 MiB
# and the COMPILER'S stack layout varies with the ray-chunk shape: a
# 167k-tri chunk compiled at 262144-ray queries but overflowed by 12 KB
# at 65536-ray queries (chip-probed, round 5) — so the cap leaves ~1 MiB
# of layout slack below the measured cliff rather than sitting on it.
CHUNK_MAX_TRIS = 160_000


def build_chunked_clusters(vertices, faces,
                           max_tris: int = CHUNK_MAX_TRIS):
    """Host-side build for VMEM-oversize scenes: contiguous face ranges
    (spatially coherent for typical mesh orderings; each chunk's own
    median split handles the rest), one resident ClusterScene per chunk,
    padded to equal counts so all chunks compile once."""
    f = np.asarray(faces)
    t = f.shape[0]
    n_chunks = -(-t // max_tris)
    if n_chunks <= 1:
        return build_clusters(vertices, faces)
    per = -(-t // n_chunks)
    chunks = []
    for i in range(n_chunks):
        fl = f[i * per:(i + 1) * per]
        pad = per - fl.shape[0]
        if pad:
            # zero faces: v0 with e1 = e2 = 0 -> det == 0, can never hit
            fl = np.concatenate([fl, np.zeros((pad, 3), f.dtype)])
        chunks.append(build_clusters(vertices, fl))
    return ClusterChunks(chunks=tuple(chunks), faces_per_chunk=per)


def _median_split_order(cent, leaf_size=LANE_TRIS):
    """Permutation putting spatially-compact groups of `leaf_size`
    triangles into contiguous blocks: recursive largest-axis median split,
    with the split point rounded to a leaf_size multiple so every block
    except the last is exactly full.

    Tighter leaf AABBs than fixed slabs of a Morton sort (the round-2
    build): a Morton slab can straddle a curve discontinuity and span the
    scene diagonally, while a median split partitions by actual spread.
    Recursion order doubles as the supercluster grouping (adjacent leaves
    share a subtree, hence a compact parent box).

    The hot path is the C++ orderer (native/cluster_order.cpp, ctypes) —
    bit-identical output, measured 5x faster at 100k triangles (18 ms vs
    88 ms); this Python recursion is the always-available fallback and the
    reference the native build is tested against (tests/test_native.py).
    """
    from pyrenderer_tpu.native import cluster_median_order_native

    native = cluster_median_order_native(cent, leaf_size)
    if native is not None:
        return native

    def split(idx):
        if idx.shape[0] <= leaf_size:
            return [idx]
        c = cent[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        idx = idx[np.argsort(c[:, ax], kind="stable")]
        half = idx.shape[0] // 2
        half = max(leaf_size, int(round(half / leaf_size)) * leaf_size)
        return split(idx[:half]) + split(idx[half:])

    return np.concatenate(split(np.arange(cent.shape[0], dtype=np.int64)))


def build_clusters(vertices, faces) -> ClusterScene:
    """Host-side build: median-split order -> 128-tri clusters -> AABB levels."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    t = f.shape[0]
    tri = v[f]                                  # (T, 3, 3)
    tmin = tri.min(axis=1)
    tmax = tri.max(axis=1)
    cent = 0.5 * (tmin + tmax)
    order = _median_split_order(cent)

    k_real = -(-t // LANE_TRIS)
    k = -(-k_real // GROUP) * GROUP
    s = k // GROUP

    # pad the order with duplicates of the last sorted face up to full
    # clusters; fully-padded clusters are masked out via NaN AABBs
    slots = k_real * LANE_TRIS
    order_p = np.concatenate([order, np.full(slots - t, order[-1], np.int64)])
    idx = order_p.reshape(k_real, LANE_TRIS)    # (K_real, 128) face ids

    fo = f[idx]                                  # (K_real, 128, 3)
    v0 = v[fo[:, :, 0]]
    e1 = v[fo[:, :, 1]] - v0
    e2 = v[fo[:, :, 2]] - v0
    planes = np.stack(
        [v0[..., 0], v0[..., 1], v0[..., 2],
         e1[..., 0], e1[..., 1], e1[..., 2],
         e2[..., 0], e2[..., 1], e2[..., 2]],
        axis=1,
    ).astype(np.float32)                         # (K_real, 9, 128)

    tri_rows = np.zeros((k, TRI_ROWS, LANE_TRIS), np.float32)
    tri_rows[:k_real, :9] = planes

    # one-ulp outward rounding: the f64 -> f32 cast of both the boxes and
    # the packed triangle planes rounds independently; widening keeps every
    # f32 triangle inside its f32 box
    cmin = np.full((k, 3), np.inf, np.float32)
    cmax = np.full((k, 3), -np.inf, np.float32)
    cmin[:k_real] = np.nextafter(
        tmin[idx].min(axis=1).astype(np.float32), np.float32(-np.inf)
    )
    cmax[:k_real] = np.nextafter(
        tmax[idx].max(axis=1).astype(np.float32), np.float32(np.inf)
    )

    # supercluster boxes BEFORE padding boxes become NaN (inf/-inf padding
    # vanishes under min/max here)
    smin = cmin.reshape(s, GROUP, 3).min(axis=1)
    smax = cmax.reshape(s, GROUP, 3).max(axis=1)
    super_box = np.concatenate([smin.T, smax.T], axis=0).astype(np.float32)

    # padded clusters: NaN boxes — NaN fails every slab comparison, so the
    # cull itself rejects padding (see ClusterScene docstring)
    cmin[k_real:] = np.nan
    cmax[k_real:] = np.nan

    # trailing GROUP all-NaN rows = the dummy supercluster's children (a
    # safe second operand for the kernel's pair-peeled visits)
    child = np.zeros((k + GROUP, LANE_TRIS), np.float32)
    child[:k, 0:3] = cmin
    child[:k, 3:6] = cmax
    child[k:, 0:3] = np.nan
    child[k:, 3:6] = np.nan

    # bin boxes: BIN adjacent clusters per row (inf/-inf padding of empty
    # clusters vanishes under min/max; fully-empty bins become inverted
    # boxes, then NaN below)
    kb = k // BIN
    bmin = np.minimum.reduce(
        [np.where(np.isnan(cmin), np.inf, cmin).reshape(kb, BIN, 3)[:, i]
         for i in range(BIN)]
    )
    bmax = np.maximum.reduce(
        [np.where(np.isnan(cmax), -np.inf, cmax).reshape(kb, BIN, 3)[:, i]
         for i in range(BIN)]
    )
    empty = ~np.isfinite(bmin).all(axis=1)
    kb32 = -(-kb // 32) * 32
    bin_box = np.zeros((kb32, LANE_TRIS), np.float32)
    bin_box[:, 0:3] = np.nan
    bin_box[:, 3:6] = np.nan
    bin_box[:kb, 0:3] = np.where(empty[:, None], np.nan, bmin)
    bin_box[:kb, 3:6] = np.where(empty[:, None], np.nan, bmax)

    s_pad = -(-s // 32) * 32
    super_cols = np.zeros((s_pad, LANE_TRIS), np.float32)
    super_cols[:, 0:3] = np.nan          # padded rows: NaN boxes never cross
    super_cols[:, 3:6] = np.nan
    super_cols[:s, 0:3] = smin
    super_cols[:s, 3:6] = smax
    bitw = (1 << (np.arange(s_pad, dtype=np.int64) % 32)).astype(np.int32)

    order_full = np.concatenate(
        [order_p, np.zeros((k - k_real) * LANE_TRIS, np.int64)]
    ).astype(np.int32)

    wlo = tmin.min(axis=0)
    wspan = np.maximum(tmax.max(axis=0) - wlo, 1e-12)
    return ClusterScene(
        tri=jnp.asarray(tri_rows.reshape(k * TRI_ROWS, LANE_TRIS)),
        child_box=jnp.asarray(child),
        bin_box=jnp.asarray(bin_box),
        super_box=jnp.asarray(super_box),
        super_cols=jnp.asarray(super_cols),
        bitw=jnp.asarray(bitw[:, None]),
        order=jnp.asarray(order_full),
        world_lo=jnp.asarray(wlo, jnp.float32),
        world_inv_span=jnp.asarray(1.0 / wspan, jnp.float32),
    )


# ---------------------------------------------------------------------------
# wavefront ray sorting (coherence for the lockstep tile sweep)
# ---------------------------------------------------------------------------

def _spread2(v):
    """Interleave 10-bit lanes with 2 zero bits (JAX uint32)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def sort_keys(cs: ClusterScene, ro, rd):
    """(N,) uint32 coherence keys: origin Morton cell (15 bits, 5/axis,
    major) | quantized direction (9 bits, 3/axis, minor). Rays sharing a
    key start in the same cell heading the same way — exactly what makes a
    tile's cull masks agree.

    Origin-major: bounce wavefronts cluster by surface locality first. The
    9 direction bits then order rays WITHIN a cell — crucial for
    shared-origin sets (primary-like bundles), where an octant-only suffix
    (the earlier design) left 1/8th of the sphere unsorted per group.
    """
    q = jnp.clip(
        (ro - cs.world_lo) * cs.world_inv_span * 32.0, 0.0, 31.0
    ).astype(jnp.uint32)
    m = (
        (_spread2(q[:, 0]) << 2) | (_spread2(q[:, 1]) << 1) | _spread2(q[:, 2])
    ) & jnp.uint32(0x7FFF)
    d8 = jnp.clip((rd + 1.0) * 4.0, 0.0, 7.0).astype(jnp.uint32)  # 3 bits/axis
    dir9 = (d8[:, 0] << 6) | (d8[:, 1] << 3) | d8[:, 2]
    return (m << jnp.uint32(9)) | dir9


# ---------------------------------------------------------------------------
# pure-JAX reference traversal (CPU oracle / differentiation-free)
# ---------------------------------------------------------------------------

def _slab(bmin, bmax, o, inv_d, t0, t1):
    """Vector slab test; bmin/bmax (..., 3) against rays (..., 3)."""
    lo = (bmin - o) * inv_d
    hi = (bmax - o) * inv_d
    t_near = jnp.maximum(jnp.max(jnp.minimum(lo, hi), axis=-1), t0)
    t_far = jnp.minimum(jnp.min(jnp.maximum(lo, hi) * (1.0 + GAMMA2_3), axis=-1), t1)
    return t_near <= t_far


def closest_hit_ref(cs: ClusterScene, ro, rd, t0, t1, watertight=False):
    """Dense pure-JAX twin of the Pallas cluster kernel.

    Tests every ray against every non-culled cluster with the same math
    (cull by cluster AABB, then an (N, 128) triangle test per cluster —
    Moeller-Trumbore, or the PBRT shear watertight test when
    `watertight=True`, mirroring the kernel's leaf selection so the same
    config gives the same hit set on CPU and TPU).
    O(N*K) — an oracle, not a fast path. Returns (hit, t, packed_slot)."""
    k = cs.n_clusters
    n = ro.shape[0]
    dtype = ro.dtype
    inv_d = 1.0 / jnp.where(rd == 0, 1e-20, rd)
    t1v = jnp.broadcast_to(t1, (n,)).astype(dtype)

    cmin = cs.child_box[:, 0:3]
    cmax = cs.child_box[:, 3:6]
    tri = cs.tri.reshape(k, TRI_ROWS, LANE_TRIS)

    def scan_cluster(carry, j):
        t_best, slot_best = carry
        keep = _slab(cmin[j], cmax[j], ro, inv_d, t0, jnp.minimum(t_best, t1v))
        rows = tri[j]
        v0 = rows[0:3].T                            # (128, 3)
        e1 = rows[3:6].T
        e2 = rows[6:9].T
        if watertight:
            from pyrenderer_tpu.core.watertight import watertight_terms

            valid, t = watertight_terms(v0, v0 + e1, v0 + e2, ro, rd)
            ok_geom = valid
        else:
            d = rd[:, None, :]
            o = ro[:, None, :]
            c = jnp.cross(e1[None], d)              # (N, 128, 3)
            det = jnp.sum(c * e2[None], axis=-1)
            inv = 1.0 / jnp.where(det == 0, 1.0, det)
            s = o - v0[None]
            q = jnp.cross(s, e2[None])
            t = -inv * jnp.sum(q * e1[None], axis=-1)
            u = -inv * jnp.sum(q * d, axis=-1)
            v = inv * jnp.sum(c * s, axis=-1)
            ok_geom = (
                (jnp.abs(det) > 0)
                & (u >= 0) & (u <= 1) & (v >= 0) & (1 - u - v >= 0)
            )
        ok = (
            keep[:, None]
            & ok_geom
            & (t > t0)
            & (t < jnp.minimum(t_best, t1v)[:, None])
        )
        tm = jnp.where(ok, t, MISS_T)
        t_new = jnp.min(tm, axis=1)
        lane = jnp.argmin(tm, axis=1).astype(jnp.int32)
        better = t_new < t_best
        t_best = jnp.where(better, t_new, t_best)
        slot_best = jnp.where(better, j * LANE_TRIS + lane, slot_best)
        return (t_best, slot_best), None

    # carries derive from `ro` (not fresh constants) so that under
    # shard_map they inherit the mesh-varying type the scan body produces
    zeros = ro[:, 0] * 0
    init = (zeros + MISS_T, zeros.astype(jnp.int32) - 1)
    (t_best, slot_best), _ = jax.lax.scan(
        scan_cluster, init, jnp.arange(k, dtype=jnp.int32)
    )
    hit = slot_best >= 0
    return hit, jnp.where(hit, t_best, 0.0), slot_best


def occluded_ref(cs: ClusterScene, ro, rd, t0, t1, watertight=False):
    """Pure-JAX any-hit twin (CPU fallback): True where something lies in
    (t0, t1). Closest-hit machinery reused — on the dense oracle path an
    early-out buys nothing."""
    hit, _, _ = closest_hit_ref(cs, ro, rd, t0, t1, watertight=watertight)
    return hit


def slot_to_face(cs: ClusterScene, slot):
    """Map packed (cluster*128 + lane) slots to original face ids (miss -> 0)."""
    return jnp.where(slot >= 0, jnp.take(cs.order, jnp.maximum(slot, 0)), 0)


def exact_t_for_slot(cs: ClusterScene, slot, ro, rd, t_packed):
    """Exact f32 hit distance for each ray's winning slot.

    The Pallas kernels pack (t | winner index) into one int32 per lane
    reduction, so their raw t output is truncated (sweep <= 2^-17, binned
    <= 2^-14 relative). This re-derives the un-truncated t with ONE
    Moeller-Trumbore evaluation per ray against the winning triangle —
    nine (N,) gathers from the packed table plus ~20 flops — restoring
    the oracle's exact-t contract at the public closest_hit boundary
    (ADVICE r4: external callers computing hit points from t got a
    slightly short t). Falls back to `t_packed` where the MT determinant
    vanishes (a watertight-leaf edge case MT cannot re-derive).
    """
    s = jnp.maximum(slot, 0)
    k = cs.n_clusters
    # one (slots, 16) row gather: the (N, 9) fancy-index form measured
    # 22 ms at N=262k on chip (XLA's gather lowering is shape-capricious,
    # perf/RESULTS.md) while per-slot row take is ~1 ms; the transpose is
    # a cheap memory-bound relayout XLA can schedule once
    by_slot = cs.tri.reshape(k, TRI_ROWS, LANE_TRIS).transpose(0, 2, 1)
    rows = jnp.take(by_slot.reshape(k * LANE_TRIS, TRI_ROWS), s, axis=0)
    v0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    c = jnp.cross(e1, rd)
    det = jnp.sum(c * e2, axis=1)
    sv = ro - v0
    q = jnp.cross(sv, e2)
    t = -jnp.sum(q * e1, axis=1) / jnp.where(det == 0, 1.0, det)
    return jnp.where(det != 0, t, t_packed)
