"""Watertight intersector tests, incl. the reference's differential-fuzz
pattern (reference debug/run.py:111-124 compared its two intersectors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.core.watertight import (
    diff_of_products,
    intersect_watertight,
)
from pyrenderer_tpu.scene.tungsten import load_tungsten


@pytest.fixture(scope="module")
def scene(cornell_path):
    s, _, _ = load_tungsten(cornell_path, dtype=np.float32)
    return jax.tree.map(jnp.asarray, s)


def test_diff_of_products_cancellation():
    # classic catastrophic cancellation: a*b - c*d where both products round
    # to the same f32 value but the true difference is nonzero
    a = jnp.float32(1.0 + 2.0 ** -12)
    b = jnp.float32(1.0 - 2.0 ** -12)
    c = jnp.float32(1.0)
    d = jnp.float32(1.0 - 2.0 ** -24)
    naive = a * b - c * d
    comp = diff_of_products(a, b, c, d)
    exact = float(np.float64(a) * np.float64(b) - np.float64(c) * np.float64(d))
    assert abs(float(comp) - exact) < 1e-12
    # the naive result loses the tiny residual entirely
    assert float(naive) != float(comp) or exact == float(naive)


def test_differential_fuzz_vs_moller_trumbore(scene):
    """Both intersectors must agree on hits/t away from edges (the
    reference's A/B fuzz, debug/run.py)."""
    rs = np.random.RandomState(7)
    n = 2000
    ro = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    ro[:, 1] += 1.0
    rd = rs.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)

    h1, t1, _ = jax.jit(intersect_watertight)(scene, ro, rd, 1e-5, 1e5)
    h2, t2, _ = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    agree = np.asarray(h1) == np.asarray(h2)
    assert agree.mean() > 0.999
    both = agree & np.asarray(h1)
    np.testing.assert_allclose(
        np.asarray(t1)[both], np.asarray(t2)[both], rtol=1e-4, atol=1e-5
    )


def test_watertight_no_edge_leak():
    """Rays aimed exactly at the shared diagonal of a quad's two triangles
    must ALWAYS hit — the watertight guarantee MT lacks."""
    from pyrenderer_tpu.scene.types import Scene

    verts = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2], [2, 3, 0]], jnp.int32)
    scene = Scene(
        vertices=verts, faces=faces,
        normal_sign=jnp.ones(2), face_material=jnp.zeros(2, jnp.int32),
        albedo=jnp.ones((1, 3)), emission=jnp.zeros((1, 3)),
        emissive=jnp.zeros(1, jnp.int32), sided=jnp.zeros(1, jnp.int32),
        mat_type=jnp.zeros(1, jnp.int32), ior=jnp.ones(1),
        roughness=jnp.zeros(1),
        light_faces=jnp.zeros((1, 1), jnp.int32), light_nfaces=jnp.ones(1, jnp.int32),
    )
    # points exactly on the diagonal x == y, z = 0
    ts = np.linspace(0.05, 0.95, 64).astype(np.float32)
    ro = jnp.stack([ts, ts, jnp.full_like(jnp.asarray(ts), 1.0)], axis=1)
    rd = jnp.broadcast_to(jnp.asarray([0, 0, -1.0], jnp.float32), (64, 3))
    hit, t, _ = intersect_watertight(scene, ro, rd, 1e-5, 1e5)
    assert bool(jnp.all(hit)), "watertight test leaked a shared-edge ray"
    np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-5)
