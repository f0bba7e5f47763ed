"""Multi-process render worker: `python -m pyrenderer_tpu.dist.worker ...`.

One OS process per "host". On real multi-host TPU slices, launch one per
host with --coordinator <host0:port> --num-processes N --process-id i (or
rely on the pod's own discovery and pass nothing). For single-machine
validation, --cpu-devices K gives each process K virtual CPU devices; the
global mesh then spans processes over gloo — the functional stand-in for
DCN (tests/test_multihost.py, perf/scaling.py --processes N).

Each process renders the SAME SPMD program; process 0 writes the assembled
HDR image (--out) and every process prints one timing/parity JSON line to
stdout (prefixed "RESULT ") for harnesses to scrape.

Reference crosswalk: this replaces joblib process fan-out with pickled
scenes and gathered return values (reference main.py:51-55) — here the
"gather" is a device collective and the scene uploads once per process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pyrenderer_tpu.dist.worker")
    p.add_argument("scene", help="Tungsten scene JSON path")
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force CPU backend with this many virtual devices")
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--spp", type=int, default=2)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sp", type=int, default=1, help="spp mesh-axis size")
    p.add_argument("--reps", type=int, default=1, help="timed repetitions")
    p.add_argument("--out", default=None, help="process 0 writes HDR .npy here")
    args = p.parse_args(argv)

    if args.cpu_devices:
        # must precede first backend touch; the interpreter-level
        # sitecustomize may already have imported jax, so use the config
        # route for the platform and XLA_FLAGS for the device count
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from pyrenderer_tpu.dist import multihost

    multi = multihost.initialize(
        args.coordinator, args.num_processes, args.process_id
    )
    pid = jax.process_index()

    import jax.numpy as jnp
    import numpy as np

    from pyrenderer_tpu.scene import load_tungsten

    scene, camera, cfg = load_tungsten(args.scene)
    camera = camera._replace(resolution=(args.res, args.res))
    cfg = cfg.replace(
        spp=args.spp, max_bounces=args.depth, seed=args.seed,
        estimator="reference", resolution=None,
    )
    mesh = multihost.make_host_mesh(sp=args.sp)

    img = multihost.render_image_multihost(scene, camera, cfg, mesh)  # warmup
    t0 = time.time()
    for _ in range(args.reps):
        img = multihost.render_image_multihost(scene, camera, cfg, mesh)
    dt = (time.time() - t0) / args.reps

    px, py = multihost._global_pixel_arrays(camera, mesh)
    n_rays = float(
        np.asarray(
            multihost._count_rays(
                jax.tree.map(jnp.asarray, scene), camera, cfg, mesh, px, py
            )
        )
    ) * cfg.spp

    if pid == 0 and args.out:
        np.save(args.out, img)
    print(
        "RESULT "
        + json.dumps(
            {
                "process_id": pid,
                "num_processes": jax.process_count(),
                "global_devices": len(jax.devices()),
                "multi": multi,
                "time_s": dt,
                "mrays_per_s": n_rays / dt / 1e6,
                "image_mean": float(img.mean()),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
