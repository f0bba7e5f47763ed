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
    """Write float radiance. `.exr` goes through the bundled pure-Python
    OpenEXR writer (utils/exr.py — scanline FLOAT, ZIP; this environment
    ships no EXR backend, and the old imageio attempt silently fell back
    to a stray `.npy` in CWD, the origin of the recurring cornell-box.npy
    artifact). Anything else is saved as `.npy`. Returns the path
    actually written."""
    hdr = np.asarray(hdr, np.float32)
    if path.endswith(".exr"):
        from pyrenderer_tpu.utils.exr import write_exr

        return write_exr(path, hdr)
    if not path.endswith(".npy"):
        path = path + ".npy"
    np.save(path, hdr)
    return path
