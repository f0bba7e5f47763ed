"""Slope-timed on-chip glue costs (corrects perf/glue.py's first run).

Two fixes over the first attempt: every measured function reduces its
output to ONE scalar inside the jit (the axon tunnel transfers at
~0.3 GB/s, so returning a 16 MB array swamped the measurement), and each
cost is the SLOPE between INNER=4 and INNER=16 in-dispatch repeats
(cancels the ~10-50 ms per-dispatch latency).

Also races fetch_rows replacement candidates for large tables:
  take        jnp.take (current path for T > 4096)
  onehot      f32 one-hot matmul, precision HIGHEST (exact)
  windowed    one-hot over a 4096-wide window around sorted indices
              (requires pre-bucketed indices; measures the matmul cost)

Run: PYTHONPATH=.:/root/.axon_site JAX_PLATFORMS=axon python -u perf/glue2.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 262144


def make_runner(fn, inner):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, carry)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return carry
    return run


def slope_time(fn, *args, reps=5):
    ts = {}
    for inner in (4, 16):
        f = make_runner(fn, inner)
        float(f(*args))  # compile + sync
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            float(f(*args))
            best = min(best, time.time() - t0)
        ts[inner] = best
    return (ts[16] - ts[4]) / 12.0


def report(name, dt, extra=""):
    print(f"{name:12s} {dt*1e3:8.3f} ms  ({dt/N*1e9:6.1f} ns/ray) {extra}",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
    ro = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    print(f"device: {jax.devices()[0]}  N={N}", flush=True)

    report("argsort", slope_time(
        lambda k, c: jnp.argsort(k + c.astype(jnp.uint32)).astype(jnp.float32), keys))
    report("sortu32", slope_time(
        lambda k, c: jnp.sort(k + c.astype(jnp.uint32)).astype(jnp.float32), keys))

    from pyrenderer_tpu.accel.clusters import build_clusters, sort_keys
    from pyrenderer_tpu.scene.procgen import terrain

    verts, faces = terrain(64)
    cs8 = build_clusters(verts, faces)
    report("keys", slope_time(
        lambda ro, rd, c: sort_keys(cs8, ro + c, rd).astype(jnp.float32), ro, rd))

    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    def permute(ro, rd, perm, c):
        ro2, rd2 = ro[perm] + c, rd[perm]
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(N, dtype=jnp.int32))
        return ro2[inv] + rd2[inv]

    report("permute", slope_time(permute, ro, rd, perm),
           "(fwd gather + inv scatter, ro+rd)")

    from pyrenderer_tpu.kernels.pallas_cluster import _pack_rays

    def packrays(ro, rd, c):
        lane, cols = _pack_rays(ro + c, rd, jnp.full((N,), 1e9))
        return jnp.sum(lane[:1, :1]) + jnp.sum(cols[:1, :1])

    report("packrays", slope_time(packrays, ro, rd))

    # ---- fetch candidates at both table sizes -------------------------
    for t_rows in (8204, 100364):
        table = jnp.asarray(rng.standard_normal((t_rows, 16)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, t_rows, N), jnp.int32)
        report(f"take{t_rows//1000}k", slope_time(
            lambda tb, ix, c: jnp.take(tb + c, ix, axis=0), table, idx))

        def onehot_fetch(tb, ix, c):
            # chunked over rows to bound the (N, T) one-hot buffer
            chunk = 32768
            outs = []
            for s in range(0, N, chunk):
                oh = jax.nn.one_hot(ix[s:s + chunk], t_rows, dtype=jnp.float32)
                outs.append(jnp.dot(oh, tb + c,
                                    precision=jax.lax.Precision.HIGHEST))
            return jnp.concatenate(outs)

        report(f"onehot{t_rows//1000}k", slope_time(onehot_fetch, table, idx))

    # windowed one-hot: indices pre-sorted, each 8192-row chunk reads a
    # 4096-wide window (cost model only; window base via idx min)
    t_rows = 100364
    table = jnp.asarray(rng.standard_normal((t_rows, 16)), jnp.float32)
    idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, t_rows, N), jnp.int32))

    def windowed(tb, ix, c):
        win = 4096
        chunk = 8192
        outs = []
        for s in range(0, N, chunk):
            sl = ix[s:s + chunk]
            base = jnp.clip(sl[0], 0, t_rows - win)
            wtab = jax.lax.dynamic_slice_in_dim(tb, base, win, axis=0)
            oh = jax.nn.one_hot(sl - base, win, dtype=jnp.float32)
            outs.append(jnp.dot(oh, wtab + c,
                                precision=jax.lax.Precision.HIGHEST))
        return jnp.concatenate(outs)

    report("window100k", slope_time(windowed, table, idx_sorted))

    # ---- wrapper overhead around the bare sweep ------------------------
    from pyrenderer_tpu.kernels import pallas_cluster as pc

    t1 = jnp.full((N,), 1e9, jnp.float32)
    lane, cols, _, _, _ = pc._prepare(cs8, ro, rd, t1, False)
    order, ss = pc._sc_order(cs8, ro)
    npad = cols.shape[0]
    t_in = jnp.full((npad, 1), pc.MISS_T_MASKED, jnp.float32)
    slot_in = jnp.full((npad, 1), -1, jnp.int32)
    report("wrap_full", slope_time(
        lambda ro, rd, c: pc.closest_hit(cs8, ro + c, rd, 1e-4, 1e9, sort=True)[1],
        ro, rd), "(sorted closest_hit incl. kernel, shuffled rays)")
    # NOTE: reduce via where(t < 1e30) — summing raw t would mix MISS_T
    # (3e38) values into the repeat carry and NaN-poison later iterations
    report("wrap_bare", slope_time(
        lambda lane, cols, c: jnp.where(
            pc._sweep(cs8, lane + c, cols, t_in, slot_in, order, ss,
                      1e-4)[0] < 1e30, 1.0, 0.0),
        lane, cols), "(bare kernel, same rays unsorted)")

    # ---- integrator bounce with stubbed intersection -------------------
    from pyrenderer_tpu.config import RenderConfig
    from pyrenderer_tpu.core.integrator import TraceTables, trace_reference
    from pyrenderer_tpu.scene.procgen import big_scene_data
    from pyrenderer_tpu.scene.tungsten import build_scene

    scene, cam, _ = build_scene(big_scene_data("terrain", res=64),
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    cfg = RenderConfig(max_bounces=4, spp=1, seed=0)
    tables = TraceTables(scene, cfg, "brute")
    nt = scene.faces.shape[0]

    def stub_closest(ro, rd, t1):
        n = ro.shape[0]
        return (jnp.ones(n, bool), jnp.full(n, 0.5, ro.dtype),
                (jnp.arange(n, dtype=jnp.int32) % nt))

    def stub_any(ro, rd, t1):
        return jnp.zeros(ro.shape[0], bool)

    stub = TraceTables.custom(tables.face_data, tables.light_data,
                              stub_closest, stub_any)
    pixel_id = jnp.arange(N, dtype=jnp.uint32)
    sample_id = jnp.zeros(N, jnp.uint32)
    dt = slope_time(lambda ro, rd, c: trace_reference(
        scene, cfg, ro + c, rd, pixel_id, sample_id, 0, tables=stub), ro, rd)
    print(f"bounce4x     {dt*1e3:8.3f} ms  ({dt/(4*N)*1e9:6.1f} ns/ray/bounce)"
          f" (4-bounce integrator, stubbed intersection)", flush=True)


if __name__ == "__main__":
    main()
