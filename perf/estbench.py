"""Slope-timed breakdown of the ESTIMATOR arithmetic (non-intersection
half of the cornell frame).

The round-5 speed-of-light table puts cornell at 0.45 of the whole-table
kernel's structural bound, with the other half measured collectively as
"integrator arithmetic: 1.1 ms/bounce/262k rays" (glue2's stubbed-
intersection row). This harness splits that collective number into its
parts so optimization targets the right one:

  rng1/rng2     one threefry2x32 evaluation (uniform / paired uniform2)
  rng_bounce    the full per-bounce RNG budget (uniform2 + uniform +
                uniform2 = 3 threefry calls, cornell's 1-light case)
  fetch_face    lut.fetch_rows on the (36, 16) cornell face table
  fetch_light   the light-point sampling block (_sample_light_point)
  shade         the differentiable shading block: re-derived t/p, normal,
                cosine sample + frame rotation, beta update, NEE geometry
  camera        generate_rays for one 262k-pixel wavefront
  bounce_arith  one full bounce_step with both intersection queries
                replaced by constants (the stub glue2 timed)
  bounce_full   one full bounce_step with the real pallas queries
                (36-tri cornell) — bounce_arith + 2 kernel calls

Protocol identical to perf/glue2.py: in-jit scalar reduction, slope of
INNER=4 vs 16 in-dispatch repeats, min over 5 dispatches.

Run: PYTHONPATH=. JAX_PLATFORMS=axon python -u perf/estbench.py
"""

import time

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
        float(f(*args))
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
    import os

    from pyrenderer_tpu import rng as prng
    from pyrenderer_tpu.config import RenderConfig
    from pyrenderer_tpu.core import lut, sampling
    from pyrenderer_tpu.core.camera import generate_rays
    from pyrenderer_tpu.core.integrator import (
        TraceTables, _sample_light_point, trace_reference,
    )
    from pyrenderer_tpu.core.sampling import INV_PI
    from pyrenderer_tpu.kernels import pallas_intersect as pk
    from pyrenderer_tpu.scene.tungsten import load_tungsten

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, camera, cfg0 = load_tungsten(
        os.path.join(root, "scenes", "cornell_box.json"), dtype=np.float32
    )
    scene = jax.tree.map(jnp.asarray, scene)
    cfg = RenderConfig(max_bounces=4, spp=1, seed=3)
    tables = TraceTables(scene, cfg, "pallas")

    rngs = np.random.default_rng(0)
    pixel = jnp.asarray(rngs.integers(0, 1 << 20, N).astype(np.uint32))
    sample = jnp.zeros((N,), jnp.uint32)
    ro = jnp.asarray(rngs.uniform(-0.8, 0.8, (N, 3)), jnp.float32)
    rd = rngs.standard_normal((N, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True),
                     jnp.float32)
    print(f"device: {jax.devices()[0]}  N={N}", flush=True)

    seed = 3

    report("rng1", slope_time(
        lambda p, c: prng.uniform(seed, p + c.astype(jnp.uint32), sample,
                                  jnp.uint32(1), prng.U_LIGHT_FACE), pixel))
    report("rng2", slope_time(
        lambda p, c: prng.uniform2(seed, p + c.astype(jnp.uint32), sample,
                                   jnp.uint32(1), prng.U_BSDF_0)[0], pixel))

    def rng_bounce(p, c):
        p = p + c.astype(jnp.uint32)
        b = jnp.uint32(1)
        u1, u2 = prng.uniform2(seed, p, sample, b, prng.U_BSDF_0)
        uf = prng.uniform(seed, p, sample, b, prng.U_LIGHT_FACE)
        ul, uv = prng.uniform2(seed, p, sample, b, prng.U_LIGHT_U)
        return u1 + u2 + uf + ul + uv

    report("rng_bounce", slope_time(rng_bounce, pixel))

    tri = jnp.asarray(rngs.integers(0, 36, N).astype(np.int32))
    report("fetch_face", slope_time(
        lambda t, c: lut.fetch_rows(tables.face_data,
                                    (t + c.astype(jnp.int32)) % 36), tri))

    report("fetch_light", slope_time(
        lambda p, c: sum(_sample_light_point(
            scene, tables, p + c.astype(jnp.uint32), sample, jnp.uint32(1),
            seed, jnp.float32)[:3]).sum(axis=-1), pixel))

    def shade(p, roc, rdc, c):
        pid = p + c.astype(jnp.uint32)
        row = lut.fetch_rows(tables.face_data, tri)
        v0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        albedo = row[:, 9:12]
        sign = row[:, 12]
        s = roc - v0
        det = jnp.sum(jnp.cross(e1, rdc) * e2, axis=-1)
        safe_det = jnp.where(det == 0, 1.0, det)
        t = -jnp.sum(jnp.cross(s, e2) * e1, axis=-1) / safe_det
        hp = roc + t[:, None] * rdc
        n_geo = sign[:, None] * sampling.safe_normalize(jnp.cross(e1, e2))
        u1, u2 = prng.uniform2(seed, pid, sample, jnp.uint32(1), prng.U_BSDF_0)
        wi_local = sampling.cosine_sample_hemisphere(u1, u2)
        wi = sampling.rotate_z_to(n_geo, wi_local)
        cos_wi = jnp.sum(n_geo * wi, axis=-1)
        pdf = jnp.abs(cos_wi) * INV_PI
        safe_pdf = jnp.where(pdf == 0, 1.0, pdf)
        scale = jnp.maximum(0.0, cos_wi) / safe_pdf * INV_PI
        beta = albedo * scale[:, None]
        return beta.sum(axis=-1) + hp.sum(axis=-1)

    report("shade", slope_time(shade, pixel, ro, rd))

    px = jnp.asarray(rngs.integers(0, 1024, N).astype(np.int32))
    py = jnp.asarray(rngs.integers(0, 1024, N).astype(np.int32))
    # carry must reach the body through a NON-foldable op: int `* 0` is
    # algebraically eliminated and the whole body hoists out of the scan
    # (measured: slope -0.2 ms vs the real 1.4 ms). Couple via sample_id.
    report("camera", slope_time(
        lambda x, c: sum(generate_rays(
            camera, x, py, sample + c.astype(jnp.uint32), seed
        )).sum(axis=-1), px))

    # full 4-bounce trace: real kernels vs stubbed intersection
    def trace4(p, roc, rdc, c):
        return trace_reference(
            scene, cfg, roc + 0 * c, rdc, p, sample, seed, tables=tables
        ).sum(axis=-1)

    report("trace4_full", slope_time(trace4, pixel, ro, rd),
           "(4 bounces incl. 8 kernel calls)")

    t_hit = jnp.full((N,), 1.0, jnp.float32)

    class _Stub:
        backend = "custom"
        face_data = tables.face_data
        light_data = tables.light_data
        accel = None
        tri_table = None
        fetch_face_fn = None

        @staticmethod
        def closest_fn(roq, rdq, t1):
            return t1 > 0, t_hit, tri

        @staticmethod
        def any_hit_fn(roq, rdq, t1):
            return t1 <= 0

    stub = _Stub()
    stub.fetch_face = lambda idx: lut.fetch_rows(tables.face_data, idx)

    def trace4_stub(p, roc, rdc, c):
        return trace_reference(
            scene, cfg, roc + 0 * c, rdc, p, sample, seed, tables=stub
        ).sum(axis=-1)

    report("trace4_stub", slope_time(trace4_stub, pixel, ro, rd),
           "(4 bounces, intersection stubbed)")

    # the pallas kernel pair alone, per bounce. BOTH calls must depend on
    # the carry or XLA hoists the invariant one out of the scan (measured:
    # slopes swinging -0.04..0.79 ms vs a stable 0.41-0.50 when coupled).
    def kpair(roc, rdc, c):
        h, t, f = pk.closest_hit(tables.tri_table, roc + 0 * c, rdc,
                                 cfg.t_min, cfg.t_max)
        occ = pk.occluded(tables.tri_table, roc + 0 * c, rdc,
                          cfg.t_min, 1.0)
        return t + occ.astype(jnp.float32)

    report("kernel_pair", slope_time(kpair, ro, rd),
           "(closest + anyhit, one bounce's queries)")


if __name__ == "__main__":
    main()
