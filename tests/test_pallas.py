"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.kernels import pallas_intersect as pk
from pyrenderer_tpu.scene.tungsten import load_tungsten


@pytest.fixture(scope="module")
def scene(cornell_path):
    s, _, _ = load_tungsten(cornell_path, dtype=np.float32)
    return jax.tree.map(jnp.asarray, s)


def _random_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    ro = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    ro[:, 1] += 1.0
    rd = rs.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_closest_hit_matches_brute(scene):
    ro, rd = _random_rays(1000)
    tri_table = pk.pack_triangles(scene.vertices, scene.faces)
    h1, t1, tri1 = pk.closest_hit(tri_table, ro, rd, 1e-5, 1e5, interpret=True)
    h2, t2, tri2 = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    hits = np.asarray(h1)
    same = (np.asarray(tri1) == np.asarray(tri2)) & hits
    assert same[hits].mean() > 0.995  # fp ties on shared edges
    np.testing.assert_allclose(np.asarray(t1)[same], np.asarray(t2)[same], rtol=1e-5)


def test_closest_hit_per_ray_t1(scene):
    ro, rd = _random_rays(256, seed=3)
    tri_table = pk.pack_triangles(scene.vertices, scene.faces)
    t1 = jnp.full((256,), 0.5, jnp.float32)
    h1, tt, _ = pk.closest_hit(tri_table, ro, rd, 1e-5, t1, interpret=True)
    o2 = isect.occluded(scene, ro, rd, 1e-5, t1)
    assert np.array_equal(np.asarray(h1), np.asarray(o2))
    assert np.all(np.asarray(tt)[np.asarray(h1)] < 0.5)


def test_nonmultiple_of_128(scene):
    ro, rd = _random_rays(100, seed=4)
    tri_table = pk.pack_triangles(scene.vertices, scene.faces)
    h, t, tri = pk.closest_hit(tri_table, ro, rd, 1e-5, 1e5, interpret=True)
    h2, t2, _ = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    assert h.shape == (100,)
    assert np.array_equal(np.asarray(h), np.asarray(h2))
