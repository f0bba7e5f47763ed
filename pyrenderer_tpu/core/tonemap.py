"""Tone mapping operators (JAX, differentiable).

Reproduces both of the reference's LDR paths:
  - "sqrt": gamma-ish sqrt of mean radiance (reference main_taichi.py:61-64
    finish(), tone_map.py:9 ldr1), NaNs mapped to 0 (tone_map.py:8);
  - "reinhard": extended Reinhard on luminance with the image's max
    luminance as white point (reference main_taichi.py:67-78
    finishing_tonemap(), tone_map.py:22-33).
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


def tonemap(hdr, mode: str):
    if mode == "sqrt":
        return tonemap_sqrt(hdr)
    if mode == "reinhard":
        return tonemap_reinhard_extended(hdr)
    if mode == "none":
        return hdr
    raise ValueError(f"unknown tonemap mode {mode!r}")
