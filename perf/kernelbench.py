"""On-chip microbenchmarks for the cluster-sweep kernel primitives.

The round-2 cluster kernel (kernels/pallas_cluster.py) measured
1.6-3.9 Mrays/s on 8k-100k-tri scenes — two orders of magnitude under the
100 Mrays/s target — so before redesigning it, this harness measures what
each primitive actually costs on the real chip:

  leaf        pure (128 x 128) Moeller-Trumbore leaf tests, no control
              flow: the speed-of-light for leaf work per tile
  extract     vector -> scalar moves (the `jnp.max(vec)` -> scalar bridge
              the sweep does once per visited supercluster)
  cond        lax.cond dispatch cost with the predicate always-false vs
              always-true (is a skipped cond free, or does Mosaic pay for
              both sides?)
  ctz         a count-trailing-zeros bit loop (the candidate replacement
              for the 16-way unrolled cond chain)
  sweep       the actual production kernel on a procgen scene

Run: JAX_PLATFORMS=tpu python perf/kernelbench.py [names...]
Timing protocol: everything loops REPS times inside one jit dispatch
(the axon tunnel has ~10 ms per-dispatch latency) and synchronizes via a
host transfer, as bench.py does.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = 256          # grid size per kernel launch
RAY_TILE = 128
INNER = 16             # kernel launches per dispatch (amortizes the ~7 ms
                       # per-dispatch latency of the axon tunnel)


def repeat_jit(fn):
    """jit(args -> out) that invokes fn INNER times inside one dispatch,
    threading a data dependency so XLA cannot dedupe the iterations."""

    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, carry)
            return jnp.sum(jax.tree.leaves(out)[0][:1]) * 0.0, out
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=INNER)
        return jax.tree.map(lambda o: o[-1], outs)

    return run


def timeit(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])     # sync after compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps / INNER


# ---------------------------------------------------------------------------
# leaf: L unconditional (128, 128) MT evaluations per tile
# ---------------------------------------------------------------------------

def _leaf_kernel(n_leaves, rcol_ref, tri_ref, t_out):
    rcol = rcol_ref[...]
    oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])
    dc = (rcol[:, 3:4], rcol[:, 4:5], rcol[:, 5:6])

    def body(j, t_best):
        blk = tri_ref[pl.ds((j % 8) * 16, 16), :]
        v0x, v0y, v0z = blk[0:1], blk[1:2], blk[2:3]
        e1x, e1y, e1z = blk[3:4], blk[4:5], blk[5:6]
        e2x, e2y, e2z = blk[6:7], blk[7:8], blk[8:9]
        ox, oy, oz = oc
        dx, dy, dz = dc
        cx = e1y * dz - e1z * dy
        cy = e1z * dx - e1x * dz
        cz = e1x * dy - e1y * dx
        det = cx * e2x + cy * e2y + cz * e2z
        inv = 1.0 / jnp.where(det == 0, 1.0, det)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        qx = sy * e2z - sz * e2y
        qy = sz * e2x - sx * e2z
        qz = sx * e2y - sy * e2x
        t = -inv * (qx * e1x + qy * e1y + qz * e1z)
        u = -inv * (qx * dx + qy * dy + qz * dz)
        v = inv * (cx * sx + cy * sy + cz * sz)
        ok = (jnp.abs(det) > 0) & (t > 1e-4) & (t < t_best) & \
             (u >= 0) & (u <= 1) & (v >= 0) & (1 - u - v >= 0)
        tm = jnp.where(ok, t, 3e38)
        return jnp.minimum(t_best, jnp.min(tm, axis=1, keepdims=True))

    t_out[...] = jax.lax.fori_loop(
        0, n_leaves, body, jnp.full((RAY_TILE, 1), 3e38, jnp.float32))


def bench_leaf():
    rng = np.random.default_rng(0)
    rcol = jnp.asarray(rng.standard_normal((N_TILES * RAY_TILE, 8)), jnp.float32)
    tri = jnp.asarray(rng.standard_normal((8 * 16, 128)), jnp.float32)
    for n_leaves in (4, 16, 64):
        f = repeat_jit(lambda rc, tr, eps: pl.pallas_call(
            partial(_leaf_kernel, n_leaves),
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES * RAY_TILE, 1), jnp.float32),
        )(rc + eps, tr))
        dt = timeit(f, rcol, tri)
        per_tile = dt / N_TILES
        print(f"leaf    L={n_leaves:3d}: {per_tile*1e6:8.2f} us/tile  "
              f"{per_tile/n_leaves*1e9:8.1f} ns/leaf  "
              f"({N_TILES*RAY_TILE*n_leaves*128/dt/1e9:.1f} G tri-tests/s)")


# ---------------------------------------------------------------------------
# extract: K vector->scalar reductions per tile
# ---------------------------------------------------------------------------

def _extract_kernel(n_ext, rcol_ref, t_out):
    rcol = rcol_ref[...]

    def body(j, acc):
        s = jnp.max(rcol + acc)          # (128, 8) -> scalar
        return acc + s * 1e-20

    acc = jax.lax.fori_loop(0, n_ext, body, jnp.float32(0.0))
    t_out[...] = jnp.zeros((RAY_TILE, 1), jnp.float32) + acc


def bench_extract():
    rng = np.random.default_rng(0)
    rcol = jnp.asarray(rng.standard_normal((N_TILES * RAY_TILE, 8)), jnp.float32)
    for n_ext in (0, 8, 32, 128):
        f = repeat_jit(lambda rc, eps: pl.pallas_call(
            partial(_extract_kernel, n_ext),
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES * RAY_TILE, 1), jnp.float32),
        )(rc + eps))
        dt = timeit(f, rcol)
        per_tile = dt / N_TILES
        per_ext = per_tile / max(n_ext, 1)
        print(f"extract K={n_ext:3d}: {per_tile*1e6:8.2f} us/tile  "
              f"{per_ext*1e9:8.1f} ns/extract")


# ---------------------------------------------------------------------------
# cond: N lax.conds per tile, all-taken vs none-taken; body = one leaf test
# ---------------------------------------------------------------------------

def _cond_kernel(n_conds, taken, rcol_ref, tri_ref, t_out):
    rcol = rcol_ref[...]
    oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])

    def leaf(j, t_best):
        blk = tri_ref[pl.ds((j % 8) * 16, 16), :]
        v = (blk[0:1] - oc[0]) * (blk[1:2] - oc[1]) * (blk[2:3] - oc[2])
        return jnp.minimum(t_best, jnp.min(v, axis=1, keepdims=True))

    def body(j, t_best):
        return jax.lax.cond(
            (j >= 0) if taken else (j < -1),
            lambda tb: leaf(j, tb), lambda tb: tb, t_best)

    t_out[...] = jax.lax.fori_loop(
        0, n_conds, body, jnp.full((RAY_TILE, 1), 3e38, jnp.float32))


def bench_cond():
    rng = np.random.default_rng(0)
    rcol = jnp.asarray(rng.standard_normal((N_TILES * RAY_TILE, 8)), jnp.float32)
    tri = jnp.asarray(rng.standard_normal((8 * 16, 128)), jnp.float32)
    for taken in (False, True):
        for n_conds in (16, 64):
            f = repeat_jit(lambda rc, tr, eps: pl.pallas_call(
                partial(_cond_kernel, n_conds, taken),
                grid=(N_TILES,),
                in_specs=[
                    pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N_TILES * RAY_TILE, 1), jnp.float32),
            )(rc + eps, tr))
            dt = timeit(f, rcol, tri)
            per = dt / N_TILES / n_conds
            print(f"cond    N={n_conds:3d} taken={taken}: "
                  f"{dt/N_TILES*1e6:8.2f} us/tile  {per*1e9:8.1f} ns/cond")


# ---------------------------------------------------------------------------
# ctz: while-loop over set bits of a word (replacement for cond chains)
# ---------------------------------------------------------------------------

def _ctz_kernel(word, rcol_ref, tri_ref, t_out):
    rcol = rcol_ref[...]
    oc = (rcol[:, 0:1], rcol[:, 1:2], rcol[:, 2:3])

    def leaf(j, t_best):
        blk = tri_ref[pl.ds((j % 8) * 16, 16), :]
        v = (blk[0:1] - oc[0]) * (blk[1:2] - oc[1]) * (blk[2:3] - oc[2])
        return jnp.minimum(t_best, jnp.min(v, axis=1, keepdims=True))

    def body(carry):
        bits, t_best = carry
        low = bits & -bits
        c = 31 - jax.lax.clz(low)
        t_best = leaf(c, t_best)
        return bits & (bits - 1), t_best

    def cond(carry):
        return carry[0] != 0

    init = (jnp.int32(word), jnp.full((RAY_TILE, 1), 3e38, jnp.float32))
    _, t_best = jax.lax.while_loop(cond, body, init)
    t_out[...] = t_best


def bench_ctz():
    rng = np.random.default_rng(0)
    rcol = jnp.asarray(rng.standard_normal((N_TILES * RAY_TILE, 8)), jnp.float32)
    tri = jnp.asarray(rng.standard_normal((8 * 16, 128)), jnp.float32)
    for word, label in ((0x1, "1 bit"), (0xF0F0, "8 bits"), (-1, "32 bits")):
        f = repeat_jit(lambda rc, tr, eps: pl.pallas_call(
            partial(_ctz_kernel, word),
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES * RAY_TILE, 1), jnp.float32),
        )(rc + eps, tr))
        dt = timeit(f, rcol, tri)
        nbits = bin(word & 0xFFFFFFFF).count("1")
        print(f"ctz     {label:8s}: {dt/N_TILES*1e6:8.2f} us/tile  "
              f"{dt/N_TILES/nbits*1e9:8.1f} ns/iter")


# ---------------------------------------------------------------------------
# sweep: the production kernel on a procgen terrain scene, primary-like rays
# ---------------------------------------------------------------------------

def bench_sweep(res=224):
    from pyrenderer_tpu.accel.clusters import build_clusters
    from pyrenderer_tpu.kernels.pallas_cluster import closest_hit, occluded
    from pyrenderer_tpu.scene.procgen import terrain

    verts, faces = terrain(res)
    t0 = time.time()
    cs = build_clusters(verts, faces)
    jax.tree.map(np.asarray, cs)
    print(f"sweep   build: {faces.shape[0]} tris, {cs.n_clusters} clusters, "
          f"{cs.n_superclusters} supers ({time.time()-t0:.1f}s)")

    n = N_TILES * RAY_TILE
    w, h = 256, n // 256
    # camera-like: one origin above the terrain, directions through a
    # row-major pixel grid (coherent tiles, like a real primary wavefront)
    ys, xs = np.mgrid[0:h, 0:w]
    u = (xs.ravel() + 0.5) / w - 0.5
    v = (ys.ravel() + 0.5) / h - 0.5
    ro = jnp.broadcast_to(jnp.asarray([0.0, 1.2, 1.4], jnp.float32), (n, 3))
    target = np.stack([u, np.zeros(n), v], axis=1)
    rd = target - np.asarray(ro)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd, jnp.float32)

    f = repeat_jit(lambda ro, rd, eps: closest_hit(cs, ro + eps, rd, 1e-4, 1e9))
    t0 = time.time()
    hit, t, face = f(ro, rd)
    np.asarray(t)
    print(f"sweep   closest compile: {time.time()-t0:.1f}s, "
          f"hit rate {float(jnp.mean(hit)):.3f}")
    dt = timeit(f, ro, rd, reps=4)
    print(f"sweep   closest: {dt/N_TILES*1e6:8.2f} us/tile  "
          f"{n/dt/1e6:8.1f} Mrays/s")

    fo = repeat_jit(lambda ro, rd, eps: occluded(cs, ro + eps, rd, 1e-4, 1e9))
    np.asarray(fo(ro, rd))
    dt = timeit(fo, ro, rd, reps=4)
    print(f"sweep   anyhit : {dt/N_TILES*1e6:8.2f} us/tile  "
          f"{n/dt/1e6:8.1f} Mrays/s")


# ---------------------------------------------------------------------------
# sort: does the coherence sort pay for itself on incoherent wavefronts?
# ---------------------------------------------------------------------------

def bench_sort(res=224):
    """Incoherent (bounce-like) wavefront through the cluster closest-hit,
    sorted vs unsorted — decides whether the integrator should spend an
    argsort per bounce (accel/clusters.sort_keys) or the claim goes."""
    from pyrenderer_tpu.accel.clusters import build_clusters
    from pyrenderer_tpu.kernels.pallas_cluster import closest_hit
    from pyrenderer_tpu.scene.procgen import terrain

    verts, faces = terrain(res)
    cs = build_clusters(verts, faces)
    n = N_TILES * RAY_TILE
    rng = np.random.default_rng(2)
    # bounce-like: origins scattered over the terrain surface, random dirs
    ro = jnp.asarray(
        np.stack([rng.uniform(-0.9, 0.9, n), rng.uniform(0.05, 0.4, n),
                  rng.uniform(-0.9, 0.9, n)], axis=1), jnp.float32)
    rd = rng.standard_normal((n, 3))
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd, jnp.float32)

    for sort in (False, True):
        f = repeat_jit(
            lambda ro, rd, eps, s=sort: closest_hit(
                cs, ro + eps, rd, 1e-4, 1e9, sort=s)[1])
        np.asarray(f(ro, rd))
        dt = timeit(f, ro, rd, reps=3)
        print(f"sort={sort!s:5s}: {dt/N_TILES*1e6:8.2f} us/tile  "
              f"{n/dt/1e6:8.1f} Mrays/s")


# ---------------------------------------------------------------------------
# binned: (ray x cluster) pair traversal vs the tile sweep, same wavefronts
# ---------------------------------------------------------------------------

def bench_binned(res=224):
    """A/B the binned pair path (pallas_binned) against the tile sweep
    (pallas_cluster) on the exact wavefronts of bench_sweep/bench_sort:
    coherent camera grid, shuffled bounce-like, each for closest + any-hit."""
    from pyrenderer_tpu.accel.clusters import build_clusters
    from pyrenderer_tpu.kernels import pallas_binned as pb
    from pyrenderer_tpu.kernels import pallas_cluster as pc
    from pyrenderer_tpu.scene.procgen import terrain

    verts, faces = terrain(res)
    cs = build_clusters(verts, faces)
    print(f"binned  scene: {faces.shape[0]} tris, {cs.n_clusters} clusters")
    n = N_TILES * RAY_TILE

    # coherent camera-like
    w, h = 256, n // 256
    ys, xs = np.mgrid[0:h, 0:w]
    u = (xs.ravel() + 0.5) / w - 0.5
    v = (ys.ravel() + 0.5) / h - 0.5
    ro_c = np.broadcast_to(np.asarray([0.0, 1.2, 1.4], np.float32), (n, 3))
    tgt = np.stack([u, np.zeros(n), v], axis=1)
    rd_c = (tgt - ro_c).astype(np.float32)
    rd_c /= np.linalg.norm(rd_c, axis=1, keepdims=True)

    # bounce-like shuffled
    rng = np.random.default_rng(2)
    ro_b = np.stack([rng.uniform(-0.9, 0.9, n), rng.uniform(0.05, 0.4, n),
                     rng.uniform(-0.9, 0.9, n)], axis=1).astype(np.float32)
    rd_b = rng.standard_normal((n, 3)).astype(np.float32)
    rd_b /= np.linalg.norm(rd_b, axis=1, keepdims=True)

    cases = [("camera", jnp.asarray(np.asarray(ro_c)), jnp.asarray(rd_c)),
             ("bounce", jnp.asarray(ro_b), jnp.asarray(rd_b))]
    for label, ro, rd in cases:
        for name, fn in (
            ("binned", lambda ro, rd, eps: pb.closest_hit(
                cs, ro + eps, rd, 1e-4, 1e9)[1]),
            ("sweep ", lambda ro, rd, eps: pc.closest_hit(
                cs, ro + eps, rd, 1e-4, 1e9,
                sort=(label == "bounce"))[1]),
        ):
            f = repeat_jit(fn)
            t0 = time.time()
            np.asarray(f(ro, rd))
            ct = time.time() - t0
            dt = timeit(f, ro, rd, reps=3)
            print(f"binned  {label} {name}: {dt/N_TILES*1e6:8.2f} us/tile  "
                  f"{n/dt/1e6:8.1f} Mrays/s   (compile {ct:.1f}s)")
        for name, fn in (
            ("binned-any", lambda ro, rd, eps: pb.occluded(
                cs, ro + eps, rd, 1e-4, 2.0)),
            ("sweep -any", lambda ro, rd, eps: pc.occluded(
                cs, ro + eps, rd, 1e-4, 2.0, sort=(label == "bounce"))),
        ):
            f = repeat_jit(fn)
            np.asarray(f(ro, rd))
            dt = timeit(f, ro, rd, reps=3)
            print(f"binned  {label} {name}: {dt/N_TILES*1e6:8.2f} us/tile  "
                  f"{n/dt/1e6:8.1f} Mrays/s")


BENCHES = {
    "leaf": bench_leaf,
    "extract": bench_extract,
    "cond": bench_cond,
    "ctz": bench_ctz,
    "sweep": bench_sweep,
    "sort": bench_sort,
    "binned": bench_binned,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(BENCHES)
    print(f"device: {jax.devices()[0]}")
    for name in names:
        BENCHES[name]()
