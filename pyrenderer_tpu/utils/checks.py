"""Numerical sanity checks (SURVEY §5.2 — the reference's only sanitizers
were Taichi debug-mode asserts and scattered NaN patches)."""

from __future__ import annotations

import numpy as np

import jax


def assert_all_finite(tree, where: str = "") -> None:
    """Host-side finite check over a pytree of arrays."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{bad} non-finite values in {jax.tree_util.keystr(path)} {where}"
            )


def validate_scene(scene) -> None:
    """Structural invariants on a Scene pytree (load-time gate)."""
    v = np.asarray(scene.vertices)
    f = np.asarray(scene.faces)
    if not np.isfinite(v).all():
        raise ValueError("scene vertices contain non-finite values")
    if f.min() < 0 or f.max() >= v.shape[0]:
        raise ValueError("face indices out of range")
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    if (area <= 0).any():
        raise ValueError(f"{int((area <= 0).sum())} degenerate (zero-area) faces")
    mats = np.asarray(scene.face_material)
    if mats.max() >= scene.albedo.shape[0]:
        raise ValueError("face material index out of range")
    lf = np.asarray(scene.light_faces)
    if lf.max() >= f.shape[0]:
        raise ValueError("light face index out of range")


def enable_nan_debugging() -> None:
    """Turn on jax's NaN debugging (fails fast inside jitted code)."""
    jax.config.update("jax_debug_nans", True)
