"""pyrenderer_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A ground-up re-design of the capabilities of sontung/pyrenderer
(a CPU/Numba + GPU/Taichi path tracer) for TPU hardware:

- **Wavefront integrator** (`core/integrator.py`): `lax.scan` over bounces on
  SoA ray buffers with alive-masks — no divergent megakernel
  (reference: core/tracing.py:117 per-pixel bounce loop).
- **Intersection as matmul** (`core/intersect.py`): Möller–Trumbore scalar
  triple products factored into bilinear forms → one MXU matmul per wavefront
  (reference: mathematics/intersection.py:42, intersection_taichi.py:69).
- **Counter-based RNG** (`rng.py` / `ref/rng_np.py`): threefry2x32 keyed by
  (pixel, sample, bounce, use) — bit-identical between the NumPy CPU oracle
  and the JAX TPU path (reference RNG was unseeded taichi_glsl/np.random).
- **Differentiable end-to-end**: radiance as a function of
  (vertices, albedo, emission) with detached discrete decisions.
- **Multi-chip** (`dist/`): pixel-tile × spp sharding over a
  `jax.sharding.Mesh` with `psum` accumulation over ICI.
"""

__version__ = "0.1.0"

from pyrenderer_tpu.scene.types import Scene, Camera  # noqa: F401
from pyrenderer_tpu.config import RenderConfig  # noqa: F401
from pyrenderer_tpu import analytic  # noqa: F401  (standalone analytic tracer;
# CLI: `python -m pyrenderer_tpu.render.cli analytic`)
