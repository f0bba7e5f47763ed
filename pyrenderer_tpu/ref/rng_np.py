"""NumPy twin of rng.py — the independent CPU-oracle implementation.

Must stay bit-identical to pyrenderer_tpu/rng.py (tested in
tests/test_rng.py). Written against NumPy only so the scalar reference
integrator (ref/scalar.py) shares zero code with the JAX path.
"""

from __future__ import annotations

import numpy as np

_ROTATIONS = ((13, 15, 26, 6), (17, 29, 16, 24))
_PARITY = np.uint32(0x1BD11BDA)

# The round-count env knob is read at CALL time (matching rng.py's
# call-time read), so parity holds no matter when either module was
# imported. Canonical Random123 subkey schedule: inject only after
# complete 4-round groups — see the round-count note in rng.py.
import os as _os  # noqa: E402


def _default_rounds():
    return int(_os.environ.get("PYRENDERER_TF_ROUNDS", "20"))


def threefry2x32(k0, k1, c0, c1, rounds=None):
    """Threefry-2x32, NumPy uint32 semantics."""
    rounds = _default_rounds() if rounds is None else rounds
    with np.errstate(over="ignore"):
        k0 = np.uint32(k0)
        k1 = np.uint32(k1)
        x0 = np.asarray(c0, np.uint32)
        x1 = np.asarray(c1, np.uint32)
        ks = (k0, k1, k0 ^ k1 ^ _PARITY)
        x0 = x0 + ks[0]
        x1 = x1 + ks[1]
        for r_idx in range(rounds):
            i = r_idx // 4
            r = _ROTATIONS[i % 2][r_idx % 4]
            x0 = (x0 + x1).astype(np.uint32)
            x1 = (((x1 << np.uint32(r)) | (x1 >> np.uint32(32 - r))) ^ x0).astype(np.uint32)
            if (r_idx + 1) % 4 == 0:
                x0 = (x0 + ks[(i + 1) % 3]).astype(np.uint32)
                x1 = (x1 + ks[(i + 2) % 3] + np.uint32(i + 1)).astype(np.uint32)
    return x0, x1


def uniform_bits(seed, pixel, sample, bounce, use):
    with np.errstate(over="ignore"):
        pixel = np.asarray(pixel, np.uint32)
        sample = np.asarray(sample, np.uint32)
        bounce = np.asarray(bounce, np.uint32)
        use = np.asarray(use, np.uint32)
        c0 = pixel
        c1 = (sample << np.uint32(12)) | (bounce << np.uint32(4)) | use
        k0 = np.uint32(seed & 0xFFFFFFFF)
        k1 = np.uint32(0x70617468)
        x0, _ = threefry2x32(k0, k1, c0, c1)
    return x0


def uniform(seed, pixel, sample, bounce, use, dtype=np.float64):
    bits = uniform_bits(seed, pixel, sample, bounce, use)
    # float32 first — identical quantization to the JAX path — then cast.
    return np.asarray((bits >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24)), dtype)


def uniform2(seed, pixel, sample, bounce, use, dtype=np.float64):
    """Twin of rng.uniform2: two uniforms from one threefry call."""
    with np.errstate(over="ignore"):
        pixel = np.asarray(pixel, np.uint32)
        sample = np.asarray(sample, np.uint32)
        bounce = np.asarray(bounce, np.uint32)
        use = np.asarray(use, np.uint32)
        c0 = pixel
        c1 = (sample << np.uint32(12)) | (bounce << np.uint32(4)) | use
        x0, x1 = threefry2x32(np.uint32(seed & 0xFFFFFFFF), np.uint32(0x70617468), c0, c1)
    scale = np.float32(1.0 / (1 << 24))
    u0 = np.asarray((x0 >> np.uint32(8)).astype(np.float32) * scale, dtype)
    u1 = np.asarray((x1 >> np.uint32(8)).astype(np.float32) * scale, dtype)
    return u0, u1
