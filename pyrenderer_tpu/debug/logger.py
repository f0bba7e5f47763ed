"""Ray-path debug logging — the TPU generalization of the reference's
RayLogger (reference debug/ray_logger.py:1-15 accumulates line segments for
open3d; SURVEY §5.5 calls for "a debug mode that records per-bounce hit
records — straight generalization of RayLogger").

`log_paths` records, for a chosen set of pixels, every bounce's hit point,
normal, outgoing direction, hit face, visibility result, and running
throughput/radiance. Export as structured NumPy (.npz) or as an ASCII PLY
line-set viewable in any mesh tool (MeshLab/Blender) — replacing the
reference's blocking open3d window (reference core/scene.py:81
visualize_o3d).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core.camera import generate_rays
from pyrenderer_tpu.core.integrator import TraceTables, trace_reference
from pyrenderer_tpu.scene.types import Camera, Scene


@dataclasses.dataclass
class RayPathLog:
    """Arrays indexed [bounce, ray]."""

    origin: np.ndarray       # (N, 3) primary ray origins
    first_dir: np.ndarray    # (N, 3)
    hit_point: np.ndarray    # (B, N, 3)
    normal: np.ndarray       # (B, N, 3)
    wi: np.ndarray           # (B, N, 3)
    t: np.ndarray            # (B, N)
    tri: np.ndarray          # (B, N)
    hit: np.ndarray          # (B, N) bool — closest-hit succeeded this bounce
    alive: np.ndarray        # (B, N) bool — path continued after this bounce
    beta: np.ndarray         # (B, N, 3)
    radiance: np.ndarray     # (B, N, 3) running estimate
    nee_visible: np.ndarray  # (B, N) bool
    light_point: np.ndarray  # (B, N, 3) sampled NEE light points

    @property
    def n_bounces(self) -> int:
        return self.hit_point.shape[0]

    def segments(self):
        """Line segments [(a, b, kind)] — kind 'path' or 'shadow'."""
        segs = []
        n = self.origin.shape[0]
        for r in range(n):
            prev = self.origin[r]
            for b in range(self.n_bounces):
                if not self.hit[b, r]:
                    break
                p = self.hit_point[b, r]
                segs.append((prev, p, "path"))
                if self.nee_visible[b, r]:
                    segs.append((p, self.light_point[b, r], "shadow"))
                prev = p
                if not self.alive[b, r]:
                    break
        return segs

    def save(self, path: str) -> None:
        np.savez(path, **dataclasses.asdict(self))

    def write_ply(self, path: str) -> None:
        """ASCII PLY line set: path segments white, shadow rays yellow."""
        segs = self.segments()
        verts = []
        edges = []
        colors = {"path": (255, 255, 255), "shadow": (255, 220, 40)}
        for a, b, kind in segs:
            i = len(verts)
            c = colors[kind]
            verts.append((a, c))
            verts.append((b, c))
            edges.append((i, i + 1))
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(verts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
            f.write(f"element edge {len(edges)}\n")
            f.write("property int vertex1\nproperty int vertex2\nend_header\n")
            for (v, c) in verts:
                f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {c[0]} {c[1]} {c[2]}\n")
            for a, b in edges:
                f.write(f"{a} {b}\n")


def log_paths(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    pixel_x,
    pixel_y,
    sample_id: int = 0,
    backend: str = "auto",
) -> RayPathLog:
    """Trace the given pixels once, recording every bounce."""
    scene = jax.tree.map(jnp.asarray, scene)
    px = jnp.asarray(pixel_x, jnp.int32)
    py = jnp.asarray(pixel_y, jnp.int32)
    w, _ = camera.resolution
    pixel_id = (py * w + px).astype(jnp.uint32)
    sample = jnp.full_like(pixel_id, sample_id)
    ro, rd = generate_rays(camera, px, py, sample, cfg.seed)
    tables = TraceTables(scene, cfg.replace(estimator="reference"), backend)
    _, ys = trace_reference(
        scene, cfg, ro, rd, pixel_id, sample, cfg.seed,
        tables=tables, collect_paths=True,
    )
    host = {k: np.asarray(v) for k, v in ys.items()}
    return RayPathLog(
        origin=np.asarray(ro),
        first_dir=np.asarray(rd),
        **host,
    )
