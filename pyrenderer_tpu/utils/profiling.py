"""Profiling & observability (SURVEY §5.1).

The reference's profiling was wall-clock samples/s prints
(main_taichi.py:114) and out-of-band line_profiler runs (commented @profile
hooks, bvh.py:217). Here:

- `DeviceTimer`: wall-clock spans with TRUE device sync — on the tunneled
  TPU backend `jax.block_until_ready` is a no-op, so the timer forces a
  scalar host transfer at each boundary;
- `RenderStats`: rays/s and samples/s accounting fed by the integrator's
  own in-scan ray counters (with_stats=True);
- `trace_profile`: context manager around jax.profiler for xprof dumps
  where the backend supports it.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp


def device_sync(x=None):
    """Force completion. Returns the (host) value of x's sum if given."""
    if x is None:
        x = jnp.zeros(())
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return None
    return float(jnp.asarray(leaves[0]).sum())


class DeviceTimer:
    """with DeviceTimer() as t: ...; t.seconds — sync-correct wall time."""

    def __init__(self, payload=None):
        self.payload = payload
        self.seconds = 0.0

    def __enter__(self):
        device_sync()
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        device_sync(self.payload)
        self.seconds = time.time() - self._t0
        return False


@dataclasses.dataclass
class RenderStats:
    rays: float = 0.0
    samples: int = 0
    pixels: int = 0
    seconds: float = 0.0

    def add(self, rays: float, samples: int, pixels: int, seconds: float):
        self.rays += rays
        self.samples += samples
        self.pixels = pixels
        self.seconds += seconds

    @property
    def mrays_per_sec(self) -> float:
        return self.rays / max(self.seconds, 1e-12) / 1e6

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(self.seconds, 1e-12)

    def summary(self) -> str:
        return (
            f"{self.mrays_per_sec:.1f} Mrays/s, "
            f"{self.samples_per_sec:.2f} samples/s, "
            f"{self.samples} spp over {self.pixels} px in {self.seconds:.2f}s"
        )


@contextlib.contextmanager
def trace_profile(log_dir: Optional[str]):
    """jax.profiler trace if a directory is given (view with xprof/TB)."""
    if not log_dir:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        # tunneled backends may not support profiling; degrade silently
        yield
