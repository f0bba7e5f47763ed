"""Slope-timed on-chip breakdown of the binned traversal pipeline.

Round-4 VERDICT weak #1: the binned backend reaches KERNEL parity with
the sweep on shuffled wavefronts (22.6 vs 21.5 ms / 32k rays) yet loses
2.6x end-to-end (1.17 vs 3.0 Mrays/s on terrain100k) — and the XLA stage
between its two kernels (pair sort, row gathers, unsort) never got the
slope-timed breakdown perf/glue2.py gave the sweep's glue. This harness
measures each stage of `_binned_core` separately at the bench wavefront
size (N = 262,144 = one 512^2 chunk), plus the streamed variant's extra
glue (segment offsets, block padding, per-slot source mapping).

Protocol: perf/glue2.py's — every measured function reduces to ONE
scalar inside the jit (the axon tunnel transfers at ~0.3 GB/s) and each
cost is the slope between 2 and 8 in-dispatch repeats (cancels the
~10-50 ms per-dispatch latency). Same-session numbers only.

Run: PYTHONPATH=.:/root/.axon_site python -u perf/binnedglue.py [N] [res]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 224


def make_runner(fn, inner):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, carry)
            return jnp.sum(out[:1]).astype(jnp.float32) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return carry
    return run


def slope_time(fn, *args, reps=5):
    ts = {}
    for inner in (2, 8):
        f = make_runner(fn, inner)
        float(f(*args))  # compile + sync
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            float(f(*args))
            best = min(best, time.time() - t0)
        ts[inner] = best
    return (ts[8] - ts[2]) / 6.0


def report(name, dt, extra=""):
    print(f"{name:14s} {dt*1e3:8.3f} ms  ({dt/N*1e9:6.1f} ns/ray) {extra}",
          flush=True)


def main():
    from pyrenderer_tpu.accel.clusters import BIN, build_clusters
    from pyrenderer_tpu.kernels import pallas_binned as pb
    from pyrenderer_tpu.kernels.pallas_cluster import _pack_rays
    from pyrenderer_tpu.scene.procgen import terrain

    verts, faces = terrain(RES)
    cs = build_clusters(verts, faces)
    kb = cs.n_clusters // BIN
    w = pb._w_slots()
    rng = np.random.default_rng(0)
    ro = jnp.asarray(
        rng.uniform(-0.8, 0.8, (N, 3)) + np.array([0, 1.5, 0]), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    t1v = jnp.full((N,), 1e9, jnp.float32)
    print(f"device: {jax.devices()[0]}  N={N}  tris={faces.shape[0]}  "
          f"kb={kb}  W={w}", flush=True)

    lane, cols = _pack_rays(ro, rd, t1v)

    # ---- stage 1: prepass ---------------------------------------------
    def prepass(lane, c):
        ids, ovf = pb._prepass_call(cs, lane + c, 1e-4, w, False)
        return ids[:, 0].astype(jnp.float32)

    report("prepass", slope_time(prepass, lane))

    ids, ovf = jax.jit(
        lambda l: pb._prepass_call(cs, l, 1e-4, w, False))(lane)
    print(f"   candidates/ray: {float((ids != pb.SENTINEL).sum()) / N:.2f}  "
          f"overflow: {float(ovf.mean())*100:.2f}%", flush=True)

    flat = ids.reshape(-1)
    p = flat.shape[0]
    pad = (-p) % (pb.BPS * pb.RAY_TILE)
    flat_p = jnp.concatenate(
        [flat, jnp.full((pad,), pb.SENTINEL, jnp.int32)])
    iota = jnp.arange(p + pad, dtype=jnp.int32)

    # ---- stage 2: the pair sort (3-array vs 2-array) -------------------
    def sort3(flat_p, c):
        s, r, q = jax.lax.sort(
            [flat_p + c.astype(jnp.int32) * 0, iota // w, iota], num_keys=1)
        return (s + r + q).astype(jnp.float32)

    def sort2(flat_p, c):
        s, q = jax.lax.sort(
            [flat_p + c.astype(jnp.int32) * 0, iota], num_keys=1)
        return (s + q // w).astype(jnp.float32)

    report("sort3", slope_time(sort3, flat_p), "(flat, ray, slot)")
    report("sort2", slope_time(sort2, flat_p), "(flat, slot; ray derived)")

    sortd, perm = jax.lax.sort([flat_p, iota], num_keys=1)
    ray_s = perm // w

    # ---- stage 3: the ray-columns gather -------------------------------
    def gather(cols, c):
        return jnp.take(cols + c, ray_s, axis=0)[:, 0]

    report("take_cols", slope_time(gather, cols),
           f"((P={p+pad}) rows of (N, 8))")

    prcol = jnp.take(cols, ray_s, axis=0)

    # ---- stage 4: the leaf kernel (resident) ---------------------------
    def leaf(prcol, c):
        keys = pb._leaf_call(cs, sortd, prcol + c, 1e-4, False, False)
        return keys.astype(jnp.float32) * 1e-9

    report("leaf", slope_time(leaf, prcol))

    keys_sorted = jax.jit(
        lambda pc_: pb._leaf_call(cs, sortd, pc_, 1e-4, False, False))(prcol)

    # ---- stage 5: unsort + reduce --------------------------------------
    def unsort(keys_sorted, c):
        inv = jnp.zeros((p + pad,), jnp.int32).at[perm].set(iota)
        key_s = jnp.take(keys_sorted + c.astype(jnp.int32) * 0, inv)[:p]
        keymat = key_s.reshape(N, w)
        kmin = jnp.min(keymat, axis=1)
        amin = jnp.argmin(keymat, axis=1)
        binwin = jnp.take_along_axis(ids, amin[:, None], axis=1)[:, 0]
        return (kmin + binwin).astype(jnp.float32)

    report("unsort+reduce", slope_time(unsort, keys_sorted))

    def scatter_unsort(keys_sorted, c):
        key_s = jnp.zeros((p + pad,), jnp.int32).at[perm].set(
            keys_sorted + c.astype(jnp.int32) * 0)[:p]
        keymat = key_s.reshape(N, w)
        kmin = jnp.min(keymat, axis=1)
        amin = jnp.argmin(keymat, axis=1)
        binwin = jnp.take_along_axis(ids, amin[:, None], axis=1)[:, 0]
        return (kmin + binwin).astype(jnp.float32)

    report("scatter_unsort", slope_time(scatter_unsort, keys_sorted),
           "(one scatter instead of inv-build + take)")

    # ---- boundary / unaccounted stages ---------------------------------
    rows = w + 1
    tiles = (N + pb.RAY_TILE - 1) // pb.RAY_TILE
    raw = jnp.zeros((rows * tiles, pb.RAY_TILE), jnp.int32)

    def ids_unpack(raw, c):
        ids, ovf = pb._ids_unpack(raw + c.astype(jnp.int32) * 0, tiles, rows, w)
        return ids[:, 0].astype(jnp.float32)

    report("ids_unpack", slope_time(ids_unpack, raw),
           "(prepass out transpose/reshape)")

    def packrays(ro, rd, c):
        lane, cols2 = pb._pack_rays(ro + c, rd, t1v)
        return lane[:1, 0]

    report("pack_rays", slope_time(packrays, ro, rd))

    from pyrenderer_tpu.accel.clusters import exact_t_for_slot, slot_to_face

    slot = jnp.abs(jnp.arange(N, dtype=jnp.int32)) % (cs.n_clusters * 128)
    tpk = jnp.ones((N,), jnp.float32)

    def exact_t(ro, rd, c):
        return exact_t_for_slot(cs, slot, ro + c, rd, tpk)

    report("exact_t", slope_time(exact_t, ro, rd), "(9-gather re-derive)")

    def s2f(ro, rd, c):
        return slot_to_face(cs, slot + c.astype(jnp.int32) * 0).astype(
            jnp.float32)

    report("slot_to_face", slope_time(s2f, ro, rd))

    def residual_sweep(ro, rd, c):
        # the all-dead residual sweep the overflow cond pays when ANY ray
        # overflows (t1r = 0 for 99.9% of rays)
        from pyrenderer_tpu.kernels import pallas_cluster as pcl

        t1r = jnp.where(jnp.arange(N) < 256, 1e9, 0.0)
        h, t, f = pcl.closest_hit(cs, ro + c, rd, 1e-4, t1r, sort=False)
        return jnp.where(t > 0, 1.0, 0.0)

    report("resid_sweep", slope_time(residual_sweep, ro, rd),
           "(sweep with 256 live rays)")

    # ---- end-to-end ----------------------------------------------------
    def core(ro, rd, c):
        kmin, binwin, ovf = pb._binned_core(
            cs, ro + c, rd, t1v, 1e-4, False, False, w)
        return jnp.where(kmin < pb.MISS_KEY, 1.0, 0.0)

    report("core_resident", slope_time(core, ro, rd))

    def core_str(ro, rd, c):
        kmin, binwin = pb._binned_core_streamed(
            cs, ro + c, rd, t1v, 1e-4, False, False, w)
        return jnp.where(kmin < pb.MISS_KEY, 1.0, 0.0)

    report("core_streamed", slope_time(core_str, ro, rd))

    # sweep comparison row (same rays, same session)
    from pyrenderer_tpu.kernels import pallas_cluster as pcl

    if pcl.scene_fits_vmem(cs):
        def sweep(ro, rd, c):
            h, t, f = pcl.closest_hit(cs, ro + c, rd, 1e-4, 1e9, sort=True)
            return jnp.where(t > 0, 1.0, 0.0)

        report("sweep_sorted", slope_time(sweep, ro, rd), "(for reference)")


if __name__ == "__main__":
    main()
