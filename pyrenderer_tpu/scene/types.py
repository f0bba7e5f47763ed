"""Flat device-array scene representation (the "array-of-struct flattener").

The reference keeps a Python object graph of primitives, each holding its own
Taichi fields (reference mathematics/shapes.py:16 Quad, :118 Cube;
core/scene.py:11 Scene) and dispatches over them with compile-time-unrolled
``ti.static`` loops (intersection_taichi.py:260). That recompiles per scene
and cannot batch. Here the whole scene is a handful of flat arrays — a JAX
pytree that jits once for a given (T, V, M, L) shape signature and shards
trivially over a device mesh.

Material type codes (mat_type):
    0 = lambert     (reference core/bsdf.py:19 BSDFLambertian)
    1 = light       (reference core/bsdf.py:46 BSDFLight, Tungsten "null")
    2 = metal       (reference core/bsdf_taichi.py:46 Metal)
    3 = dielectric  (reference core/bsdf_taichi.py:62 Dielectric)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

MAT_LAMBERT = 0
MAT_LIGHT = 1
MAT_METAL = 2
MAT_DIELECTRIC = 3


class Scene(NamedTuple):
    """Triangle-soup scene. Shapes: V vertices, T faces, M materials, L light prims."""

    vertices: jnp.ndarray      # (V, 3) float — differentiable leaf
    faces: jnp.ndarray         # (T, 3) int32 — indices into vertices
    normal_sign: jnp.ndarray   # (T,) float — face normal = sign * normalize(cross(e1, e2))
                               #   (reference shapes.py:47 negates quad normals, cube keeps +)
    face_material: jnp.ndarray # (T,) int32 — index into material table

    albedo: jnp.ndarray        # (M, 3) float — differentiable leaf
    emission: jnp.ndarray      # (M, 3) float — radiance ("physical" mode); differentiable leaf
    emissive: jnp.ndarray      # (M,) int32 — 1 for lights
    sided: jnp.ndarray         # (M,) int32 — 1: keep stored normal; 0: flip toward -rd
                               #   (reference shapes.py:103 "if not sided and n·(-rd)<0: n=-n")
    mat_type: jnp.ndarray      # (M,) int32 — MAT_* code
    ior: jnp.ndarray           # (M,) float — dielectric index of refraction
    roughness: jnp.ndarray     # (M,) float — metal fuzz

    # Light sampling tables: uniform pick of a light *prim*, then a uniform
    # face inside it (reference intersection_taichi.py:194 sample_a_light →
    # shapes.py:63 sample_a_point with randInt over the prim's faces).
    light_faces: jnp.ndarray   # (L, F_max) int32 — face ids, padded by repeating face 0
    light_nfaces: jnp.ndarray  # (L,) int32 — real face count per light prim

    @property
    def n_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def n_lights(self) -> int:
        return self.light_faces.shape[0]


class Camera(NamedTuple):
    """Pinhole camera with optional square aperture (reference core/camera.py:13).

    ``iview`` is the inverse of the row-vector-convention look-at matrix:
    world = homogeneous(cam) @ iview (reference core/camera.py:63-64).
    """

    iview: jnp.ndarray        # (4, 4) float
    fov_deg: jnp.ndarray      # () float
    focal_dist: jnp.ndarray   # () float
    aperture: jnp.ndarray     # () float
    resolution: Tuple[int, int]  # (W, H) — static


def scene_to_numpy(scene: Scene) -> "Scene":
    """Host copy of every array (for the NumPy oracle)."""
    return Scene(*[np.asarray(x) for x in scene])
