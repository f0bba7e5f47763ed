"""Ablation timing of the bounce loop on the current backend (run on TPU).

Builds stripped variants of the reference-mode bounce loop from the same
building blocks and times them with TRUE host-sync boundaries (this
backend's block_until_ready is a no-op).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from pyrenderer_tpu import rng
    from pyrenderer_tpu.config import RenderConfig
    from pyrenderer_tpu.core import lut, sampling
    from pyrenderer_tpu.core.integrator import (
        TraceTables,
        _any_hit,
        _closest,
        _sample_light_point,
        trace_reference,
    )
    from pyrenderer_tpu.scene import load_tungsten

    n = 1 << 20
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene, camera, _ = load_tungsten(os.path.join(root, "scenes", "cornell_box.json"))
    scene = jax.tree.map(jnp.asarray, scene)
    cfg = RenderConfig(max_bounces=4, seed=0)
    print(f"device={jax.devices()[0]} n={n}", file=sys.stderr)

    rs = np.random.RandomState(0)
    ro = jnp.asarray(rs.uniform(-0.9, 0.9, (n, 3)), jnp.float32) + jnp.array(
        [0, 1, 0], jnp.float32
    )
    rd = jnp.asarray(rs.normal(size=(n, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    pid = jnp.arange(n, dtype=jnp.uint32)

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        float(jnp.asarray(out).sum())
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.asarray(out).sum())
        return (time.time() - t0) / iters * 1e3

    results = {}

    # full reference trace
    def full(ro, rd, pid):
        tables = TraceTables(scene, cfg, "auto")
        return trace_reference(scene, cfg, ro, rd, pid, pid * 0, 0, tables=tables)

    results["full_4bounce"] = timeit(jax.jit(full), ro, rd, pid)

    # intersections only: 4x closest + 4x anyhit on a carried ray
    def isect_only(ro, rd):
        tables = TraceTables(scene, cfg, "auto")

        def step(state, _):
            ro, rd = state
            hit, t, tri = _closest(scene, tables, cfg, ro, rd, cfg.t_max)
            occ = _any_hit(scene, tables, cfg, ro, rd, t)
            ro = ro + t[:, None] * rd * 0.5
            rd = jnp.where(occ[:, None], -rd, rd)
            return (ro, rd), None

        (ro, rd), _ = jax.lax.scan(step, (ro, rd), None, length=4)
        return ro

    results["isect_only_4x2"] = timeit(jax.jit(isect_only), ro, rd)

    # fetch only: 4x face row + light row fetches
    def fetch_only(ro, pid):
        tables = TraceTables(scene, cfg, "auto")

        def step(acc, b):
            tri = (pid + b).astype(jnp.int32) % scene.faces.shape[0]
            row = lut.fetch_rows(tables.face_data, tri)
            p2, n2, em, _ = _sample_light_point(
                scene, tables, pid, pid * 0, b, 0, jnp.float32
            )
            return acc + row[:, 0:3] + p2 * n2 * em, None

        acc, _ = jax.lax.scan(step, ro * 0, jnp.arange(4, dtype=jnp.uint32))
        return acc

    results["fetch_only_4x"] = timeit(jax.jit(fetch_only), ro, pid)

    # rng + frame math only
    def shade_math_only(ro, rd, pid):
        def step(state, b):
            ro, rd = state
            u1, u2 = rng.uniform2(0, pid, pid * 0, b, rng.U_BSDF_0, jnp.float32)
            wi = sampling.rotate_z_to(-rd, sampling.cosine_sample_hemisphere(u1, u2))
            return (ro + wi * 0.01, wi), None

        (ro, rd), _ = jax.lax.scan(step, (ro, rd), jnp.arange(4, dtype=jnp.uint32))
        return ro

    results["rng_frame_4x"] = timeit(jax.jit(shade_math_only), ro, rd, pid)

    print(f"{'variant':20s} {'ms':>8s}")
    for k, v in results.items():
        print(f"{k:20s} {v:8.2f}")


if __name__ == "__main__":
    main()
