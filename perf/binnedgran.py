"""Pair-granularity probe for the binned traversal (round-3/4's
"two-level stream" question, VERDICT r4 task 6).

The candidate-statistics simulation said finer leaves cut tests/ray
almost linearly (69 at 128-tri vs 500 at 512-tri bins on bounce
wavefronts) but that in-kernel sub-block skipping dies on scalar syncs.
The binned stream already moved all branch decisions into a sort — so
the finer granularity is ONE KNOB away: PYRENDERER_BIN=1 makes a "bin"
a single 128-triangle cluster (prepass boxes = cluster boxes, leaf runs
1 chunk/pair instead of 4). Costs that move against it: 4x prepass boxes
(4x slab words + peel work), more pairs after the cap (finer boxes cross
MORE often per ray... no — finer boxes are SMALLER, crossings/ray drop:
0.54 clusters vs 0.98 bins simulated), same sort size (N*W slots).

This harness runs the SAME wavefront through both granularities in
subprocesses (BIN is an import-time constant: scene build and kernels
must agree) and prints core times. Run:
  PYTHONPATH=.:/root/.axon_site python -u perf/binnedgran.py
"""

import os
import subprocess
import sys

CHILD = r"""
import jax, numpy as np, jax.numpy as jnp, time
from pyrenderer_tpu.scene.procgen import terrain
from pyrenderer_tpu.accel import clusters as cl
from pyrenderer_tpu.kernels import pallas_binned as pb

N = 262144
def slope_time(fn, *args, reps=5):
    ts = {}
    for inner in (2, 8):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = fn(*a, c)
                return jnp.sum(out[:1]).astype(jnp.float32)*0.0, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
            return c
        float(run(*args))
        best = np.inf
        for _ in range(reps):
            t0=time.time(); float(run(*args)); best=min(best,time.time()-t0)
        ts[inner]=best
    return (ts[8]-ts[2])/6.0

verts, faces = terrain(224)
cs = cl.build_clusters(verts, faces)
rng = np.random.default_rng(0)
ro = jnp.asarray(rng.uniform(-0.8,0.8,(N,3)) + np.array([0,1.5,0]), jnp.float32)
rd = jnp.asarray(rng.standard_normal((N,3)), jnp.float32)
rd = rd/jnp.linalg.norm(rd,axis=1,keepdims=True)
t1v = jnp.full((N,), 1e9, jnp.float32)
w = pb._w_slots()

lane, cols = pb._pack_rays(ro, rd, t1v)
ids, ovf = jax.jit(lambda l: pb._prepass_call(cs, l, 1e-4, w, False))(lane)
cand = float((ids != pb.SENTINEL).sum()) / N

def core(ro, rd, c):
    kmin, binwin, o = pb._binned_core(cs, ro+c, rd, t1v, 1e-4, False, False, w)
    return jnp.where(kmin < pb.MISS_KEY, 1.0, 0.0)
dt = slope_time(core, ro, rd)
print(f"BIN={cl.BIN}: bins={cs.bin_box.shape[0]} cand/ray={cand:.2f} "
      f"ovf={float(ovf.mean())*100:.2f}%% core={dt*1e3:.3f} ms "
      f"({N/dt/1e6:.2f} Mrays/s)", flush=True)

# parity spot-check vs the oracle on a small slice
h, t, f = pb.closest_hit(cs, ro[:4096], rd[:4096], 1e-4, 1e9, exact_t=False)
h2, t2, s2 = cl.closest_hit_ref(cs, ro[:4096], rd[:4096], 1e-4, 1e9)
print(f"BIN={cl.BIN}: hit agree {(np.asarray(h)==np.asarray(h2)).mean():.4f}",
      flush=True)
"""


def main():
    for bin_ in ("4", "1", "2"):
        env = dict(os.environ, PYRENDERER_BIN=bin_)
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("BIN="):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"BIN={bin_} FAILED:\n{r.stderr[-2000:]}", flush=True)


if __name__ == "__main__":
    main()
