"""Multi-device scaling-efficiency harness (BASELINE north star: >=85%
rays/s efficiency from 1 to N devices).

On real multi-chip hardware run as-is; on a single host set
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the sharded path functionally (CPU numbers are not a
performance statement, the harness is the deliverable).

Prints a table of device count vs Mrays/s and the parallel efficiency.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from pyrenderer_tpu.config import RenderConfig
    from pyrenderer_tpu.dist.render import make_mesh, render_field_sharded
    from pyrenderer_tpu.scene import load_tungsten

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene, camera, _ = load_tungsten(os.path.join(root, "scenes", "cornell_box.json"))
    scene = jax.tree.map(jnp.asarray, scene)
    res = int(os.environ.get("SCALE_RES", "256"))
    camera = camera._replace(resolution=(res, res))
    cfg = RenderConfig(max_bounces=4, spp=int(os.environ.get("SCALE_SPP", "8")), seed=0)

    w, h = camera.resolution
    ys, xs = np.mgrid[0:h, 0:w]
    px = jnp.asarray(xs.reshape(-1), jnp.int32)
    py = jnp.asarray(ys.reshape(-1), jnp.int32)

    n_devices = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    # rays estimate: reuse the single-device integrator count convention
    # (closest+shadow, live lanes); for the table relative numbers matter.
    approx_rays = w * h * cfg.spp * (2 * cfg.max_bounces) * 0.8

    rows = []
    for n in counts:
        mesh = make_mesh(n, dp=n, sp=1)
        f = jax.jit(render_field_sharded, static_argnames=("cfg", "mesh"))
        out = f(scene, camera, cfg, mesh, px, py)
        float(jnp.asarray(out).sum())  # compile+sync
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = f(scene, camera, cfg, mesh, px, py)
        float(jnp.asarray(out).sum())
        dt = (time.time() - t0) / reps
        rows.append((n, approx_rays / dt / 1e6, dt))

    base = rows[0][1]
    print(f"{'devices':>8s} {'Mrays/s':>10s} {'time(s)':>8s} {'efficiency':>10s}")
    for n, mrays, dt in rows:
        eff = mrays / (base * n)
        print(f"{n:8d} {mrays:10.1f} {dt:8.3f} {eff:9.1%}")


if __name__ == "__main__":
    main()
