"""Tone mapping operators (JAX, differentiable).

Reproduces both of the reference's LDR paths, plus the "filmic" operator
Tungsten's scene.json actually asks for (scene.json:277 — parsed but
ignored by the reference, aliased to reinhard in this repo's round 1):
  - "sqrt": gamma-ish sqrt of mean radiance (reference main_taichi.py:61-64
    finish(), tone_map.py:9 ldr1), NaNs mapped to 0 (tone_map.py:8);
  - "reinhard": extended Reinhard on luminance with the image's max
    luminance as white point (reference main_taichi.py:67-78
    finishing_tonemap(), tone_map.py:22-33);
  - "filmic": Hable/Uncharted-2 filmic curve per channel, white-point
    normalized, followed by sRGB-ish 1/2.2 gamma. Matches Tungsten's own
    TONEMAP "filmic" semantics (a fitted shoulder/toe curve), not a
    Reinhard alias.
"""

from __future__ import annotations

import jax.numpy as jnp

LUMA_WEIGHTS = (0.2126, 0.7152, 0.0722)


def tonemap_sqrt(hdr):
    """sqrt tonemap of mean radiance (reference main_taichi.py:63)."""
    hdr = jnp.nan_to_num(hdr, nan=0.0)
    return jnp.clip(jnp.sqrt(jnp.maximum(hdr, 0.0)), 0.0, 1.0)


def tonemap_reinhard_extended(hdr):
    """Luminance extended-Reinhard with max-luminance white point
    (reference main_taichi.py:67-78)."""
    hdr = jnp.nan_to_num(hdr, nan=0.0)
    lum = (
        hdr[..., 0] * LUMA_WEIGHTS[0]
        + hdr[..., 1] * LUMA_WEIGHTS[1]
        + hdr[..., 2] * LUMA_WEIGHTS[2]
    )
    max_white = jnp.maximum(jnp.max(lum), 1e-8)
    numerator = lum * (1.0 + lum / (max_white * max_white))
    l_new = numerator / (1.0 + lum)
    scale = jnp.where(lum > 0, l_new / jnp.where(lum == 0, 1.0, lum), 0.0)
    return jnp.clip(hdr * scale[..., None], 0.0, 1.0)


# Hable/Uncharted-2 constants (shoulder strength, linear strength/angle,
# toe strength/numerator/denominator) and the linear white point.
_HABLE_A, _HABLE_B, _HABLE_C = 0.15, 0.50, 0.10
_HABLE_D, _HABLE_E, _HABLE_F = 0.20, 0.02, 0.30
_HABLE_W = 11.2


def _hable(x):
    a, b, c, d, e, f = _HABLE_A, _HABLE_B, _HABLE_C, _HABLE_D, _HABLE_E, _HABLE_F
    return (x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f) - e / f


def tonemap_filmic(hdr, exposure: float = 2.0):
    """Hable filmic curve, per channel, + 1/2.2 gamma. Monotone increasing,
    maps 0 -> 0 and the white point W -> 1 before gamma."""
    hdr = jnp.nan_to_num(hdr, nan=0.0)
    x = jnp.maximum(hdr, 0.0) * exposure
    mapped = _hable(x) / _hable(jnp.asarray(_HABLE_W, hdr.dtype))
    return jnp.clip(jnp.power(jnp.maximum(mapped, 0.0), 1.0 / 2.2), 0.0, 1.0)


def tonemap(hdr, mode: str):
    if mode == "sqrt":
        return tonemap_sqrt(hdr)
    if mode == "reinhard":
        return tonemap_reinhard_extended(hdr)
    if mode == "filmic":
        return tonemap_filmic(hdr)
    if mode == "none":
        return hdr
    raise ValueError(f"unknown tonemap mode {mode!r}")
