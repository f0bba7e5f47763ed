"""Headline benchmark: Mrays/s/chip at 4 bounces.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 100 — BASELINE.md's >=100 Mrays/s/chip target (the
reference publishes no numbers of its own; SURVEY §6).

Rays counted = live closest-hit rays + NEE shadow rays (dead masked lanes
excluded), as accumulated inside the integrator's bounce scan.

Env knobs:
  BENCH_SCENE   cornell (default, the headline 36-tri Bitterli box) |
                terrain8k | terrain100k | blob82k — procgen large scenes
                (scene/procgen.py) exercising the cluster accelerator
  BENCH_BACKEND auto (default) | pallas | matmul | brute | cluster | ...
  BENCH_SPP     timed full-frame passes (default 16; 4 for large scenes)
  BENCH_RES     resolution (default 1024; 512 for large scenes)
  BENCH_CHUNK   rays per dispatch chunk (default 2^16 = a 256x256 Morton
                screen block; chip-swept round 5: 2^16 beats 2^18 on
                EVERY scene — cornell +2%, terrain100k +19%, blob82k
                +16% — because smaller Morton chunks give each 128-ray
                tile a tighter screen footprint, shrinking the cluster
                sweep's tile unions; 2^15/2^14 lose the gains back)
  BENCH_ESTIMATOR  reference (default) | pbrt
  BENCH_WATERTIGHT 1 -> cluster backend uses watertight leaves
  BENCH_SORT       0 | 1 | auto (default: sort only for >=32k-tri scenes)
  BENCH_ROUNDS     cluster suspend/resume passes (default 1 = off)
  BENCH_BUDGET     pass-1 supercluster visit budget per tile (default 8)

The JSON line also carries "calib_ns_per_leaf": a fixed microkernel
timing measured in the same session (see calibrate()) that lets
cross-round BENCH values be normalized against the chip facility's ~2x
day-to-day load swings.

perf/RESULTS.md records measured values for each on the real chip.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

SCENES = {
    # name -> (loader kwargs, default res, default spp, metric name)
    "cornell": (None, 1024, 16, "cornell_box_4bounce_mrays_per_sec_per_chip"),
    "spheres": (None, 1024, 16, "spheres_4bounce_mrays_per_sec_per_chip"),
    "terrain8k": (dict(kind="terrain", res=64), 512, 4,
                  "terrain8k_4bounce_mrays_per_sec_per_chip"),
    "terrain100k": (dict(kind="terrain", res=224), 512, 4,
                    "terrain100k_4bounce_mrays_per_sec_per_chip"),
    # past the ~220k-tri VMEM ceiling: auto-routes to the HBM-streamed
    # binned traversal (backend "cluster_streamed") on TPU
    "terrain330k": (dict(kind="terrain", res=406), 512, 2,
                    "terrain330k_4bounce_mrays_per_sec_per_chip"),
    "terrain500k": (dict(kind="terrain", res=501), 512, 2,
                    "terrain500k_4bounce_mrays_per_sec_per_chip"),
    "blob82k": (dict(kind="blob", subdivisions=6), 512, 4,
                "blob82k_4bounce_mrays_per_sec_per_chip"),
}


def load_bench_scene(name):
    from pyrenderer_tpu.scene import load_tungsten

    procgen_kw, res, spp, metric = SCENES[name]
    if procgen_kw is None:
        root = os.path.dirname(os.path.abspath(__file__))
        json_name = "cornell_box.json" if name == "cornell" else f"{name}.json"
        scene, camera, _ = load_tungsten(
            os.path.join(root, "scenes", json_name)
        )
    else:
        from pyrenderer_tpu.scene.procgen import big_scene_data
        from pyrenderer_tpu.scene.tungsten import build_scene

        scene, camera, _ = build_scene(big_scene_data(**procgen_kw))
    return scene, camera, res, spp, metric


def calibrate():
    """Session-calibration microkernel: ns per full-width (128 x 128) MT
    leaf evaluation, the same L=64 protocol as perf/kernelbench.py
    bench_leaf (its reference reading: ~820 ns on an unloaded facility
    day).

    The remote chip facility's throughput varies ~2x day-to-day AND
    within an hour (perf/RESULTS.md "Measurement integrity"), so absolute
    BENCH_r0N.json values across rounds are facility noise. This row is
    measured in the SAME session as the headline number; to compare
    rounds, normalize: value_normalized = value * (calib_ns / 820.0).
    Slope-timed (inner 2 vs 8 in-dispatch repeats) to cancel the
    ~10-50 ms per-dispatch tunnel latency. Returns None off-TPU.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        return None
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "perf")
    )
    from kernelbench import N_TILES, RAY_TILE, _leaf_kernel

    rng = np.random.default_rng(0)
    rcol = jnp.asarray(rng.standard_normal((N_TILES * RAY_TILE, 8)), jnp.float32)
    tri = jnp.asarray(rng.standard_normal((8 * 16, 128)), jnp.float32)
    n_leaves = 64

    def call(rc):
        return pl.pallas_call(
            partial(_leaf_kernel, n_leaves),
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES * RAY_TILE, 1), jnp.float32),
        )(rc, tri)

    def runner(inner):
        @jax.jit
        def run(rc):
            def body(c, _):
                out = call(rc + c)
                return jnp.sum(out[:1, :1]) * 0.0, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
            return c

        return run

    ts = {}
    for inner in (2, 8):
        f = runner(inner)
        float(f(rcol))  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(f(rcol))
            best = min(best, time.time() - t0)
        ts[inner] = best
    per_leaf = (ts[8] - ts[2]) / 6.0 / (N_TILES * n_leaves)
    return per_leaf * 1e9


def main():
    import jax
    import jax.numpy as jnp

    from pyrenderer_tpu.config import RenderConfig
    from pyrenderer_tpu.core.camera import generate_rays
    from pyrenderer_tpu.core.integrator import (
        TraceTables,
        maybe_build_accel,
        trace_reference,
    )

    scene_name = os.environ.get("BENCH_SCENE", "cornell")
    estimator = os.environ.get("BENCH_ESTIMATOR", "reference")
    # default follows RenderConfig.cluster_watertight; "1" forces the
    # leak-free (1.36-1.73x slower) watertight leaves
    watertight = {"0": False, "1": True}.get(
        os.environ.get("BENCH_WATERTIGHT", ""), RenderConfig.cluster_watertight)
    sort = {"0": False, "1": True}.get(
        os.environ.get("BENCH_SORT", "auto"), "auto")
    scene, camera, def_res, def_spp, metric = load_bench_scene(scene_name)

    res = int(os.environ.get("BENCH_RES", str(def_res)))
    spp = int(os.environ.get("BENCH_SPP", str(def_spp)))
    chunk = int(os.environ.get("BENCH_CHUNK", str(1 << 16)))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    # accelerator build runs on host arrays, outside jit
    accel = maybe_build_accel(scene, backend)
    scene = jax.tree.map(jnp.asarray, scene)

    camera = camera._replace(resolution=(res, res))
    cfg = RenderConfig(max_bounces=4, spp=spp, seed=0, estimator=estimator,
                       cluster_watertight=watertight, cluster_sort=sort,
                       cluster_rounds=int(os.environ.get("BENCH_ROUNDS", "1")),
                       cluster_budget=int(os.environ.get("BENCH_BUDGET", "8")))
    w, h = camera.resolution

    from pyrenderer_tpu.core.camera import pixel_order

    # Morton pixel order, exactly as render_image traces a real frame: each
    # 128-ray tile is then a compact screen block (coherent primaries)
    ys, xs = np.mgrid[0:h, 0:w]
    perm, _ = pixel_order(
        w, h, os.environ.get("PYRENDERER_PIXEL_ORDER", "morton"))
    xs = jnp.asarray(xs.reshape(-1)[perm], jnp.int32)
    ys = jnp.asarray(ys.reshape(-1)[perm], jnp.int32)

    n_chunks = (w * h + chunk - 1) // chunk
    # chunked pixel coords: (n_chunks, chunk) — statically indexed inside jit
    # so the whole benchmark is ONE dispatch (per-dispatch latency through
    # the TPU tunnel is ~10 ms and would otherwise dominate).
    pad = n_chunks * chunk - w * h
    xs_c = jnp.pad(xs, (0, pad)).reshape(n_chunks, chunk)
    ys_c = jnp.pad(ys, (0, pad)).reshape(n_chunks, chunk)

    @partial(jax.jit, static_argnames=("n_samples",))
    def bench_all(scene, xs_c, ys_c, first_sample, n_samples):
        tables = TraceTables(scene, cfg, backend, accel=accel)

        def one_sample(carry, s):
            total, rays = carry
            for c in range(n_chunks):
                px, py = xs_c[c], ys_c[c]
                pixel_id = (py * w + px).astype(jnp.uint32)
                sample = jnp.full_like(pixel_id, s)
                ro, rd = generate_rays(camera, px, py, sample, cfg.seed)
                if estimator == "reference":
                    rad, n_rays = trace_reference(
                        scene, cfg, ro, rd, pixel_id, sample, cfg.seed,
                        tables=tables, with_stats=True,
                    )
                else:
                    from pyrenderer_tpu.core.integrator_pbrt import trace_pbrt

                    rad, n_rays = trace_pbrt(
                        scene, cfg, ro, rd, pixel_id, sample, cfg.seed,
                        tables=tables, with_stats=True,
                    )
                total = total + rad.sum(axis=0)
                rays = rays + n_rays
            return (total, rays), None

        init = (jnp.zeros(3), jnp.zeros(()))
        (total, rays), _ = jax.lax.scan(
            one_sample, init,
            first_sample + jnp.arange(n_samples, dtype=jnp.uint32),
        )
        return total, rays

    tag = "" if estimator == "reference" else f",{estimator}"
    # cluster_watertight defaults to "auto" (leak-free leaves on >=32k-tri
    # meshes); tag/metric suffixes mark only FORCED settings
    tag += ",watertight" if watertight is True else ""
    tag += ",nowatertight" if watertight is False else ""
    tag += ",nosort" if not sort else ""
    print(
        f"bench[{scene_name}{tag}]: {w}x{h}, {scene.faces.shape[0]} tris, "
        f"{spp} passes, chunk={chunk} ({n_chunks} chunks/pass), "
        f"backend={backend}, device={jax.devices()[0]}",
        file=sys.stderr,
    )

    # warmup / compile. NOTE: jax.block_until_ready does NOT synchronize on
    # the axon tunnel backend — only a host transfer (float()/np.asarray)
    # does, so every timing boundary here forces one.
    t0 = time.time()
    float(bench_all(scene, xs_c, ys_c, jnp.uint32(0), n_samples=spp)[1])
    print(f"warmup {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    mean_rad, total_rays = bench_all(scene, xs_c, ys_c, jnp.uint32(0), n_samples=spp)
    total_rays = float(total_rays)  # true device sync
    dt = time.time() - t0
    mean_rad = np.asarray(mean_rad)

    mrays = total_rays / dt / 1e6
    mean_val = float(mean_rad.sum()) / (w * h * spp * 3)  # noqa: already host
    print(
        f"{dt:.2f}s, {total_rays/1e6:.1f} Mrays, mean radiance {mean_val:.5f}",
        file=sys.stderr,
    )
    calib = calibrate()  # same-session facility-load normalizer
    if calib is not None:
        print(
            f"calib {calib:.0f} ns/leaf (ref 820; normalized "
            f"{mrays * calib / 820.0:.1f} Mrays/s)",
            file=sys.stderr,
        )
    row = {
        "metric": metric
        + ("_" + estimator if estimator != "reference" else "")
        + ("_watertight" if watertight is True else "")
        + ("_nowatertight" if watertight is False else "")
        + ("_nosort" if not sort else ""),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
    }
    if calib is not None:
        # facility-day calibration: cross-round comparisons should use
        # value * (calib_ns_per_leaf / 820.0) — see calibrate()
        row["calib_ns_per_leaf"] = round(calib, 1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
