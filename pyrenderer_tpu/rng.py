"""Counter-based RNG: Threefry-2x32, keyed by (pixel, sample, bounce, use).

The reference renderer has no seedable RNG at all (taichi_glsl.randgen.rand on
GPU, ad-hoc np.random on CPU — see reference mathematics/samplers.py:4,
test.py:9), which makes matched-seed parity impossible there. Here every
uniform draw is a pure function of ``(seed, pixel_id, sample_id, bounce,
use)``, so the scalar NumPy oracle (ref/rng_np.py) and the vectorized JAX
path produce bit-identical streams by construction.

Counter layout (c0, c1 are the Threefry counter words):
    c0 = pixel_id                       (uint32: up to 4G pixels)
    c1 = (sample_id << 12) | (bounce << 4) | use
         sample_id: 20 bits (1M spp), bounce: 8 bits (256), use: 4 bits (16)

Key = (seed, 0x70617468)  ("path" tag, distinguishes streams per application).

Uniforms are produced as ``(bits >> 8) * 2**-24`` → float32 in [0, 1).
"""

from __future__ import annotations

import jax.numpy as jnp


# Use-slot assignments within one bounce (or the camera slot).
# Camera draws live at bounce = CAMERA_BOUNCE.
U_PIXEL_X = 0
U_PIXEL_Y = 1
U_LENS_X = 2
U_LENS_Y = 3
U_BSDF_0 = 4
U_BSDF_1 = 5
U_BSDF_2 = 6
U_LIGHT_PRIM = 7
U_LIGHT_FACE = 8
U_LIGHT_U = 9
U_LIGHT_V = 10
U_RR = 11
U_LIGHT_STRAT = 12

CAMERA_BOUNCE = 255

_ROTATIONS = ((13, 15, 26, 6), (17, 29, 16, 24))
_PARITY = 0x1BD11BDA
_U32 = (1 << 32) - 1

# Round count. 20 is Threefry's conservative default; 13 is the smallest
# count that passes the full BigCrush battery in the Random123 paper
# (Salmon et al., SC'11, Table 2 — crush-resistance headroom starts at 13
# for Threefry-2x32). The env knob is read at CALL time in both this
# module and the NumPy oracle (ref/rng_np.py), so parity holds no matter
# when either module was imported. Subkeys inject only after COMPLETE
# 4-round groups (the canonical Random123 schedule — no injection after
# a truncated final group), so rounds=13 matches the published variant
# the citation refers to; rounds=20 is unchanged either way.
import os as _os


def _default_rounds() -> int:
    return int(_os.environ.get("PYRENDERER_TF_ROUNDS", "20"))


def threefry2x32(k0, k1, c0, c1, rounds: int | None = None):
    """Threefry-2x32. All inputs/outputs uint32 arrays."""
    rounds = _default_rounds() if rounds is None else rounds
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(c0, jnp.uint32)
    x1 = jnp.asarray(c1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(_PARITY))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for r_idx in range(rounds):
        i = r_idx // 4
        r = _ROTATIONS[i % 2][r_idx % 4]
        x0 = x0 + x1
        x1 = ((x1 << r) | (x1 >> (32 - r))) ^ x0
        if (r_idx + 1) % 4 == 0:
            x0 = x0 + ks[(i + 1) % 3]
            x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def uniform_bits(seed: int, pixel, sample, bounce, use):
    """Random uint32 for each broadcast element of (pixel, sample, bounce, use)."""
    pixel = jnp.asarray(pixel, jnp.uint32)
    sample = jnp.asarray(sample, jnp.uint32)
    bounce = jnp.asarray(bounce, jnp.uint32)
    use = jnp.asarray(use, jnp.uint32)
    c0 = pixel
    c1 = (sample << 12) | (bounce << 4) | use
    k0 = jnp.uint32(seed & _U32)
    k1 = jnp.uint32(0x70617468)
    x0, _ = threefry2x32(k0, k1, c0, c1)
    return x0


def uniform(seed: int, pixel, sample, bounce, use, dtype=jnp.float32):
    """Uniform in [0, 1) — float from the top 24 bits, identical to the oracle."""
    bits = uniform_bits(seed, pixel, sample, bounce, use)
    return ((bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))).astype(dtype)


def uniform2(seed: int, pixel, sample, bounce, use, dtype=jnp.float32):
    """Two uniforms from ONE threefry call (both output words) — halves RNG
    cost for the paired draws (pixel jitter, lens, bsdf u1/u2, light u/v).
    The pair is addressed by the first use-slot; the oracle mirrors this."""
    pixel = jnp.asarray(pixel, jnp.uint32)
    sample = jnp.asarray(sample, jnp.uint32)
    bounce = jnp.asarray(bounce, jnp.uint32)
    use = jnp.asarray(use, jnp.uint32)
    c0 = pixel
    c1 = (sample << 12) | (bounce << 4) | use
    x0, x1 = threefry2x32(jnp.uint32(seed & _U32), jnp.uint32(0x70617468), c0, c1)
    scale = jnp.float32(1.0 / (1 << 24))
    u0 = ((x0 >> 8).astype(jnp.float32) * scale).astype(dtype)
    u1 = ((x1 >> 8).astype(jnp.float32) * scale).astype(dtype)
    return u0, u1
