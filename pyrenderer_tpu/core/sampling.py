"""Batched sampling primitives (JAX).

Algorithms mirror the reference so images line up:
  - PBRT concentric-disk → cosine-hemisphere (reference
    mathematics/samplers.py:10-32);
  - "rotate z to normal" shading frame (reference mathematics/
    mat4_taichi.py:9-60: x = normalize(cross(n, y_hat)),
    z = normalize(cross(x, n)), world = lx*x + ly*z + lz*n, re-normalized,
    with special cases for n ≈ ±y_hat);
  - sqrt-barycentric uniform area sampling (reference shapes.py:63-71).

All functions are shape-polymorphic over a leading batch axis; vectors are
(..., 3) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.141592653589793
INV_PI = 1.0 / PI
_AXIS_EPS = 1e-6  # reference uses float32-tiny (constants.py EPS); any value
                  # << 1 ulp-of-normals behaves identically


def safe_sqrt(x):
    """sqrt with a NaN-free backward at x <= 0 (double-where: guard the
    operand, not just the result — where(c, 0, sqrt(x)) still propagates
    inf*0 = NaN cotangents through the unselected branch)."""
    nonpos = x <= 0
    return jnp.where(nonpos, 0.0, jnp.sqrt(jnp.where(nonpos, 1.0, x)))


def safe_normalize(v, fallback=None):
    """v / |v| with NaN-free value AND gradient at |v| == 0."""
    ss = jnp.sum(v * v, axis=-1, keepdims=True)
    zero = ss == 0
    inv = 1.0 / jnp.sqrt(jnp.where(zero, 1.0, ss))
    out = v * jnp.where(zero, 0.0, inv)
    if fallback is not None:
        out = jnp.where(zero, fallback, out)
    return out


def concentric_sample_disk(u1, u2):
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe_ox = jnp.where(ox == 0, 1.0, ox)
    safe_oy = jnp.where(oy == 0, 1.0, oy)
    theta = jnp.where(
        use_x,
        (PI / 4) * (oy / safe_ox),
        (PI / 2) - (PI / 4) * (ox / safe_oy),
    )
    zero = (ox == 0) & (oy == 0)
    dx = jnp.where(zero, 0.0, r * jnp.cos(theta))
    dy = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return dx, dy


def cosine_sample_hemisphere(u1, u2):
    """Local-frame direction with z up; pdf = z / pi."""
    dx, dy = concentric_sample_disk(u1, u2)
    z = safe_sqrt(1.0 - dx * dx - dy * dy)
    return jnp.stack([dx, dy, z], axis=-1)


def make_frame(n):
    """Shading frame (x_hat, z_hat) completing normal n, reference
    mat4_taichi.py:9-47 semantics. n: (..., 3), assumed unit length."""
    ny = n[..., 1]
    pos_y = jnp.abs(ny - 1.0) < _AXIS_EPS
    neg_y = jnp.abs(ny + 1.0) < _AXIS_EPS
    axis = pos_y | neg_y

    # general branch: x = normalize(cross(n, y_hat)) = normalize((-nz, 0, nx))
    gx = safe_normalize(
        jnp.stack([-n[..., 2], jnp.zeros_like(ny), n[..., 0]], axis=-1)
    )
    gz = safe_normalize(jnp.cross(gx, n))

    ex = jnp.zeros_like(n).at[..., 0].set(1.0)
    ez = jnp.zeros_like(n).at[..., 2].set(1.0)
    x_hat = jnp.where(axis[..., None], ex, gx)
    z_hat = jnp.where(axis[..., None], ez, gz)
    return x_hat, z_hat


def rotate_z_to(n, local):
    """Map local (z-up) direction into the frame of normal n and normalize
    (reference mat4_taichi.py:45-60 rotate_z_to + rotate_vector).

    Note the reference's frame for n ≈ -y_hat maps local z to -n (its
    rotate_to flips only the y row); we reproduce that by composing with the
    returned frame: world = lx*x + ly*z + lz*n_frame where n_frame respects
    the reference's special cases."""
    ny = n[..., 1]
    neg_y = jnp.abs(ny + 1.0) < _AXIS_EPS
    pos_y = jnp.abs(ny - 1.0) < _AXIS_EPS
    ey = jnp.zeros_like(n).at[..., 1].set(1.0)
    # reference special cases: +y -> frame y row (0,1,0); -y -> (0,-1,0)
    n_frame = jnp.where(pos_y[..., None], ey, jnp.where(neg_y[..., None], -ey, n))
    x_hat, z_hat = make_frame(n)
    world = (
        local[..., 0:1] * x_hat
        + local[..., 1:2] * z_hat
        + local[..., 2:3] * n_frame
    )
    return safe_normalize(world)


def sample_triangle_point(v0, v1, v2, u, v):
    """sqrt-barycentric uniform area sample (reference shapes.py:63-71):
    a = sqrt(u)(1-v), b = sqrt(u)v, p = a*v0 + b*v1 + (1-a-b)*v2."""
    su = jnp.sqrt(u)
    a = (su * (1.0 - v))[..., None]
    b = (su * v)[..., None]
    return a * v0 + b * v1 + (1.0 - a - b) * v2
