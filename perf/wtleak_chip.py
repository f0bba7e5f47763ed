"""On-chip watertight edge-case probe: the COMPILED Mosaic kernel vs the
exact-diagonal shared-edge hunt (tests/test_watertight.py runs it in
interpret mode only, i.e. through XLA:CPU).

Round-5 finding this probe exists to pin down: the e == 0 fallback
trigger of rounds 1-4 was fusion-dependent (XLA may contract the edge
products into an fma, leaving a +/-1-ulp residue instead of exactly 0),
so whether the compensated fallback ever fired depended on surrounding
code. The fix is a relative threshold (core/watertight._EDGE_REL_TOL).
This probe measures, for each fallback mode, how many exactly-on-edge
rays the compiled TPU kernel leaks:

  always — threshold-selected compensation, evaluated densely
  guard  — same, under a per-leaf any-under-threshold lax.cond
  off    — no compensation (how bad Mosaic's raw contraction is)

Run: PYTHONPATH=.:/root/.axon_site python -u perf/wtleak_chip.py
Expected: always == guard == 0 leaked; off documents the raw behavior.
Also checks the sweep AND binned compiled kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pyrenderer_tpu.accel.clusters import build_clusters
from pyrenderer_tpu.kernels import pallas_binned as pb
from pyrenderer_tpu.kernels import pallas_cluster as pc


def main():
    assert jax.default_backend() == "tpu", "chip probe"
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    cs = build_clusters(verts, faces)
    n = 4096
    ts = np.linspace(1e-4, 1.0 - 1e-4, n).astype(np.float32)
    on_edge = np.stack([ts, ts, np.zeros(n, np.float32)], axis=1)
    ro = jnp.asarray(on_edge + np.asarray([0.0, 0.0, 1.0], np.float32))
    rd = jnp.asarray(
        np.broadcast_to(np.asarray([0.0, 0.0, -1.0], np.float32), (n, 3))
    )
    for mode in ("always", "guard", "off"):
        pc._WT_FALLBACK = mode
        hit, t, f = pc.closest_hit(cs, ro, rd, 1e-5, 10.0, watertight=True)
        leaked = int((~np.asarray(hit)).sum())
        occ = pc.occluded(cs, ro, rd, 1e-5, 10.0, watertight=True)
        leaked_any = int((~np.asarray(occ)).sum())
        hb, tb, fb = pb.closest_hit(cs, ro, rd, 1e-5, 10.0, watertight=True)
        leaked_b = int((~np.asarray(hb)).sum())
        print(f"{mode:6s}: sweep leaked {leaked}/{n}  "
              f"anyhit {leaked_any}/{n}  binned {leaked_b}/{n}", flush=True)
        # jit caches key on static args only; _WT_FALLBACK is read at trace
        # time, so clear caches between modes
        jax.clear_caches()
    pc._WT_FALLBACK = "guard"


if __name__ == "__main__":
    main()
