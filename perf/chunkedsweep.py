"""Capacity-path A/B: HBM-streamed binned traversal vs a CHUNKED resident
sweep (the scene split into VMEM-sized pieces, swept sequentially with
the running per-ray t-bound carried between chunks).

Both lift the ~14.5 MiB VMEM ceiling; they pay differently:
  streamed — every triangle bin crosses HBM per query; zero redundancy;
             wavefront-order independent.
  chunked  — each chunk is VMEM-resident during its sweep (tables upload
             once per compile, not per query) but every chunk pays its
             own dense supercluster prepass over ALL rays, and the
             lockstep union re-amortizes per chunk. Exact: the carried
             t-bound makes later chunks cull against earlier hits.

Run: PYTHONPATH=.:/root/.axon_site python -u perf/chunkedsweep.py [res...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pyrenderer_tpu.accel.clusters import build_clusters
from pyrenderer_tpu.kernels import pallas_binned as pb
from pyrenderer_tpu.kernels import pallas_cluster as pc
from pyrenderer_tpu.scene.procgen import terrain

N = 32768


def slope_time(fn, *args, reps=5):
    ts = {}
    for inner in (2, 8):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = fn(*a, c)
                return jnp.sum(out[:1]).astype(jnp.float32) * 0.0, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
            return c
        float(run(*args))
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            float(run(*args))
            best = min(best, time.time() - t0)
        ts[inner] = best
    return (ts[8] - ts[2]) / 6.0


def build_chunks(verts, faces, max_tris=180_000):
    """Split faces into contiguous ranges, one resident ClusterScene each
    (terrain faces are grid-ordered, so ranges are spatial bands)."""
    t = faces.shape[0]
    n_chunks = -(-t // max_tris)
    per = -(-t // n_chunks)
    return [
        build_clusters(verts, faces[i * per:(i + 1) * per])
        for i in range(n_chunks)
    ]


def chunked_closest(chunks, ro, rd, t0, t1, sort):
    t_best = jnp.full(ro.shape[0], jnp.inf, jnp.float32)
    hit_any = jnp.zeros(ro.shape[0], bool)
    for cs in chunks:
        bound = jnp.minimum(t1, jnp.where(hit_any, t_best, t1))
        h, t, f = pc.closest_hit(cs, ro, rd, t0, bound, sort=sort,
                                 exact_t=False)
        better = h & (t < jnp.where(hit_any, t_best, jnp.inf))
        t_best = jnp.where(better, t, t_best)
        hit_any = hit_any | h
    return hit_any, t_best


def main():
    resolutions = [int(a) for a in sys.argv[1:]] or [406, 501]
    rng = np.random.default_rng(0)
    ro = jnp.asarray(
        rng.uniform(-0.8, 0.8, (N, 3)) + np.array([0, 1.5, 0]), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    print(f"device: {jax.devices()[0]}  N={N} shuffled rays", flush=True)

    for res in resolutions:
        verts, faces = terrain(res)
        chunks = build_chunks(verts, faces)
        cs_full = build_clusters(verts, faces)
        label = f"terrain{faces.shape[0]//1000}k"

        def f_streamed(ro, rd, c):
            h, t, f = pb.closest_hit(cs_full, ro + c, rd, 1e-4, 1e9,
                                     streamed=True, exact_t=False)
            return jnp.where(t > 0, 1.0, 0.0)

        dt_s = slope_time(f_streamed, ro, rd)

        for sort in (False, True):
            def f_chunk(ro, rd, c, s=sort):
                h, t = chunked_closest(chunks, ro + c, rd, 1e-4, 1e9, s)
                return jnp.where(h, 1.0, 0.0)

            dt_c = slope_time(f_chunk, ro, rd)
            if not sort:
                # parity: chunked vs streamed must agree
                h_c, t_c = jax.jit(
                    lambda ro, rd: chunked_closest(chunks, ro, rd, 1e-4,
                                                   1e9, False))(ro, rd)
                h_s, t_s, _ = pb.closest_hit(cs_full, ro, rd, 1e-4, 1e9,
                                             streamed=True)
                agree = float((np.asarray(h_c) == np.asarray(h_s)).mean())
                print(f"{label}: streamed {dt_s*1e3:8.3f} ms | chunked "
                      f"x{len(chunks)} nosort {dt_c*1e3:8.3f} ms | "
                      f"hit agree {agree:.4f}", flush=True)
            else:
                print(f"{label}: chunked x{len(chunks)} sorted "
                      f"{dt_c*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
