"""Component microbenchmarks on the current backend (run on TPU).

Times each stage of the wavefront at a fixed ray count to locate the
bottleneck: intersection (matmul vs brute), RNG draws, shading frame math,
and the full bounce step.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from pyrenderer_tpu import rng
    from pyrenderer_tpu.config import RenderConfig
    from pyrenderer_tpu.core import intersect as isect
    from pyrenderer_tpu.core import sampling
    from pyrenderer_tpu.core.camera import generate_rays
    from pyrenderer_tpu.core.integrator import trace_reference
    from pyrenderer_tpu.scene import load_tungsten

    n = int(os.environ.get("MB_N", str(1 << 20)))
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene, camera, _ = load_tungsten(os.path.join(root, "scenes", "cornell_box.json"))
    scene = jax.tree.map(jnp.asarray, scene)
    print(f"device={jax.devices()[0]} n_rays={n}", file=sys.stderr)

    rs = np.random.RandomState(0)
    ro = jnp.asarray(rs.uniform(-0.9, 0.9, (n, 3)), jnp.float32) + jnp.array([0, 1, 0], jnp.float32)
    rd = jnp.asarray(rs.normal(size=(n, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    tm = isect.build_tri_matrix(scene)

    only = os.environ.get("MB_ONLY", "").split(",") if os.environ.get("MB_ONLY") else None

    def want(name):
        return only is None or any(name.startswith(o) for o in only)

    results = {}

    from pyrenderer_tpu.kernels import pallas_intersect as pkn

    if want("pallas"):
        tri_table = pkn.pack_triangles(scene.vertices, scene.faces)
        f_pal = jax.jit(lambda ro, rd: pkn.closest_hit(tri_table, ro, rd, 1e-5, 1e5))
        results["pallas_closest"] = timeit(f_pal, ro, rd)
        f_palo = jax.jit(
            lambda ro, rd: pkn.occluded(tri_table, ro, rd, 1e-5, jnp.full(ro.shape[:1], 2.0))
        )
        results["pallas_occluded"] = timeit(f_palo, ro, rd)

    if want("packed_gather"):
        from pyrenderer_tpu.core.integrator import pack_face_data

        fd = pack_face_data(scene)
        tri = jnp.arange(n, dtype=jnp.int32) % scene.faces.shape[0]
        f_pg = jax.jit(lambda tri: fd[tri])
        results["packed_gather16"] = timeit(f_pg, tri)

    if want("intersect_matmul"):
        f_mm = jax.jit(lambda ro, rd: isect.intersect_matmul(scene, ro, rd, 1e-5, 1e5, tm))
        results["intersect_matmul"] = timeit(f_mm, ro, rd)

    if want("intersect_brute"):
        f_br = jax.jit(lambda ro, rd: isect.intersect_brute(scene, ro, rd, 1e-5, 1e5))
        results["intersect_brute"] = timeit(f_br, ro, rd)

    if want("occluded_matmul"):
        f_occ = jax.jit(lambda ro, rd: isect.occluded_matmul(scene, ro, rd, 1e-5, jnp.full(ro.shape[:1], 2.0), tm))
        results["occluded_matmul"] = timeit(f_occ, ro, rd)

    if want("rng"):
        f_rng8 = jax.jit(
            lambda pid: sum(
                rng.uniform(0, pid, 0, 1, u) for u in range(8)
            )
        )
        results["rng_8draws"] = timeit(f_rng8, pixel_id)

    if want("frame"):
        def frame_math(rd_in, u1, u2):
            nrm = -rd_in
            wi_local = sampling.cosine_sample_hemisphere(u1, u2)
            return sampling.rotate_z_to(nrm, wi_local)

        f_frame = jax.jit(frame_math)
        u1 = rng.uniform(0, pixel_id, 0, 0, 0)
        u2 = rng.uniform(0, pixel_id, 0, 0, 1)
        results["frame_math"] = timeit(f_frame, rd, u1, u2)

    if want("vertex_gather"):
        def gather_shading(tri):
            f = scene.faces[tri]
            v0 = scene.vertices[f[:, 0]]
            v1 = scene.vertices[f[:, 1]]
            v2 = scene.vertices[f[:, 2]]
            return v0 + v1 + v2

        tri = jnp.arange(n, dtype=jnp.int32) % scene.faces.shape[0]
        f_gather = jax.jit(gather_shading)
        results["vertex_gather"] = timeit(f_gather, tri)

    if want("trace"):
        from pyrenderer_tpu.core.integrator import TraceTables

        cfg = RenderConfig(max_bounces=4, spp=1, seed=0)
        backend = os.environ.get("MB_BACKEND", "auto")

        def tr(ro, rd, pid):
            tables = TraceTables(scene, cfg, backend)
            return trace_reference(
                scene, cfg, ro, rd, pid, pid * 0, 0, tables=tables, with_stats=True
            )[1]

        f_trace = jax.jit(tr)
        results[f"trace_4bounce_{backend}"] = timeit(f_trace, ro, rd, pixel_id, iters=5)

    if want("camera"):
        px = jnp.asarray(rs.randint(0, 1024, n), jnp.int32)
        py = jnp.asarray(rs.randint(0, 1024, n), jnp.int32)
        f_cam = jax.jit(lambda px, py: generate_rays(camera, px, py, px.astype(jnp.uint32) * 0, 0))
        results["camera_raygen"] = timeit(f_cam, px, py)

    print(f"{'stage':24s} {'ms':>8s} {'Mitems/s':>10s}")
    for k, v in results.items():
        print(f"{k:24s} {v*1e3:8.2f} {n/v/1e6:10.1f}")


if __name__ == "__main__":
    main()
