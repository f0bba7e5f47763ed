"""Image output: PNG (LDR) and EXR/NPY (HDR).

Reference wrote PNG via ti.imwrite / skimage (reference main_taichi.py:125,
main.py:59) and HDR state via np.save (main_taichi.py:120-123).
"""

from __future__ import annotations

import numpy as np


def write_png(path: str, ldr: np.ndarray) -> None:
    """ldr in [0, 1], (H, W, 3) -> 8-bit PNG."""
    arr = (np.clip(np.asarray(ldr), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    import imageio.v3 as iio

    iio.imwrite(path, arr)


def write_hdr(path: str, hdr: np.ndarray) -> str:
    """Write float radiance. Tries EXR via imageio; falls back to .npy.
    Returns the path actually written."""
    hdr = np.asarray(hdr, np.float32)
    if path.endswith(".exr"):
        try:
            import imageio.v3 as iio

            iio.imwrite(path, hdr)
            return path
        except Exception:
            path = path[:-4] + ".npy"
    if not path.endswith(".npy"):
        path = path + ".npy"
    np.save(path, hdr)
    return path
