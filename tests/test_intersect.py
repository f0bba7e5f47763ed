"""Intersection tests: brute-force VPU path vs MXU matmul path vs geometry facts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.scene.tungsten import load_tungsten


@pytest.fixture(scope="module")
def scene(cornell_path):
    s, _, _ = load_tungsten(cornell_path, dtype=np.float32)
    return jax.tree.map(jnp.asarray, s)


def test_axis_rays_hit_walls(scene):
    ro = jnp.array(
        [
            [0.6, 1.0, 6.8],   # right of the boxes -> back wall at z=-1, t=7.8
            [0.0, 1.0, 0.0],   # center -> floor at y=0, t=1
            [0.0, 1.0, 0.0],   # center -> ceiling; light panel hangs at y=1.98
            [0.9, 1.0, 0.9],   # corner -> right wall at x=1 (boxes out of the way)
            [0.0, 1.0, 6.8],   # camera axis -> tall box (top ~1.2) before back wall
        ],
        jnp.float32,
    )
    rd = jnp.array(
        [[0, 0, -1.0], [0, -1.0, 0], [0, 1.0, 0], [1.0, 0, 0], [0, 0, -1.0]],
        jnp.float32,
    )
    hit, t, tri = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    assert bool(jnp.all(hit))
    np.testing.assert_allclose(np.asarray(t)[:4], [7.8, 1.0, 0.98, 0.1], rtol=1e-4)
    assert 6.5 < float(t[4]) < 7.8  # occluded by the tall box, not the wall
    mats = np.asarray(scene.face_material)[np.asarray(tri)]
    emissive = np.asarray(scene.emissive)[mats]
    assert emissive[2] == 1  # straight up from the center hits the light
    assert np.allclose(np.asarray(scene.albedo)[mats[0]], [0.725, 0.71, 0.68])


def test_miss(scene):
    ro = jnp.array([[0.0, 1.0, 6.8]], jnp.float32)
    rd = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)  # away from the box
    hit, _, _ = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    assert not bool(hit[0])


def _random_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    ro = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    ro[:, 1] += 1.0
    rd = rs.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_matmul_matches_brute(scene):
    ro, rd = _random_rays(512)
    h1, t1, tri1 = jax.jit(isect.intersect_brute, static_argnums=())(
        scene, ro, rd, 1e-5, 1e5
    )
    h2, t2, tri2 = isect.intersect_matmul(scene, ro, rd, 1e-5, 1e5)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    # identical triangle picks modulo fp ties; t agree tightly
    # identical picks except for fp ties on shared edges of coplanar pairs
    same = np.asarray(tri1) == np.asarray(tri2)
    assert same.mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(t1)[same], np.asarray(t2)[same], rtol=2e-4, atol=2e-5
    )


def test_occlusion_paths_agree(scene):
    ro, rd = _random_rays(256, seed=1)
    t1 = jnp.full((256,), 1.5, jnp.float32)
    o1 = isect.occluded(scene, ro, rd, 1e-5, t1)
    o2 = isect.occluded_matmul(scene, ro, rd, 1e-5, t1)
    assert (np.asarray(o1) == np.asarray(o2)).mean() > 0.995


def test_tri_matrix_differentiable(scene):
    """d(t)/d(vertices) must flow through the matmul formulation."""

    def hit_t(vertices):
        s = scene._replace(vertices=vertices)
        ro = jnp.array([[0.0, 1.0, 6.8]], jnp.float32)
        rd = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
        w = isect.build_tri_matrix(s)
        _, t, _, _ = isect.mt_terms_matmul(w, ro, rd)
        tri = 4  # back wall first face
        return t[0, tri]

    g = jax.grad(hit_t)(scene.vertices)
    # moving the back wall along z changes t: nonzero gradient somewhere
    assert float(jnp.abs(g).sum()) > 1e-3
