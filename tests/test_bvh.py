"""BASELINE config 2: .obj mesh + BVH traversal."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.accel import bvh as bvh_mod
from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.core.integrator import render_image
from pyrenderer_tpu.scene.obj import parse_obj
from pyrenderer_tpu.scene.tungsten import load_tungsten
from pyrenderer_tpu.scene.types import Scene


def make_sphere_mesh(n_theta=20, n_phi=32):
    """UV-sphere triangle mesh (~2*n_theta*n_phi tris) for stress tests."""
    thetas = np.linspace(0, np.pi, n_theta + 1)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    idx = {}
    for i, th in enumerate(thetas):
        for j, ph in enumerate(phis):
            idx[(i, j)] = len(verts)
            verts.append(
                [np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph)]
            )
    faces = []
    for i in range(n_theta):
        for j in range(n_phi):
            j2 = (j + 1) % n_phi
            a, b = idx[(i, j)], idx[(i, j2)]
            c, d = idx[(i + 1, j)], idx[(i + 1, j2)]
            if i > 0:
                faces.append([a, b, d])
            if i < n_theta - 1:
                faces.append([a, d, c])
    return np.asarray(verts), np.asarray(faces, np.int32)


def _mesh_scene(verts, faces):
    t = faces.shape[0]
    return Scene(
        vertices=jnp.asarray(verts, jnp.float32),
        faces=jnp.asarray(faces),
        normal_sign=jnp.ones(t, jnp.float32),
        face_material=jnp.zeros(t, jnp.int32),
        albedo=jnp.ones((1, 3), jnp.float32),
        emission=jnp.zeros((1, 3), jnp.float32),
        emissive=jnp.zeros(1, jnp.int32),
        sided=jnp.zeros(1, jnp.int32),
        mat_type=jnp.zeros(1, jnp.int32),
        ior=jnp.ones(1, jnp.float32),
        roughness=jnp.zeros(1, jnp.float32),
        light_faces=jnp.zeros((1, 1), jnp.int32),
        light_nfaces=jnp.ones(1, jnp.int32),
    )


def test_obj_parser():
    text = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
f -4//1 -3//2 -2//3
"""
    v, f = parse_obj(text)
    assert v.shape == (4, 3)
    # quad fans into 2 tris + one more face
    assert f.shape == (3, 3)
    assert f[0].tolist() == [0, 1, 2]
    assert f[1].tolist() == [0, 2, 3]
    assert f[2].tolist() == [0, 1, 2]


def test_lbvh_structure():
    verts, faces = make_sphere_mesh(8, 12)
    bvh = bvh_mod.build_lbvh(verts, faces, leaf_size=4)
    first = np.asarray(bvh.first)
    count = np.asarray(bvh.count)
    escape = np.asarray(bvh.escape)
    # leaves cover every triangle exactly once
    covered = []
    for i in range(bvh.n_nodes):
        if count[i] > 0:
            covered.extend(range(first[i], first[i] + count[i]))
    assert sorted(covered) == list(range(faces.shape[0]))
    # escape pointers are forward (or -1), pre-order property
    assert escape[0] == -1
    for i in range(bvh.n_nodes):
        assert escape[i] == -1 or escape[i] > i
    # root bbox encloses the mesh
    np.testing.assert_allclose(np.asarray(bvh.bbox_min[0]), verts.min(0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bvh.bbox_max[0]), verts.max(0), atol=1e-6)


def test_traversal_matches_brute_sphere():
    verts, faces = make_sphere_mesh(16, 24)  # 736 tris
    scene = _mesh_scene(verts, faces)
    bvh = bvh_mod.build_lbvh(scene.vertices, scene.faces)
    ordered = scene.faces[bvh.order]
    v = scene.vertices
    v0 = v[ordered[:, 0]]
    e1 = v[ordered[:, 1]] - v0
    e2 = v[ordered[:, 2]] - v0

    rs = np.random.RandomState(0)
    n = 512
    ro = jnp.asarray(rs.uniform(-2, 2, (n, 3)), jnp.float32)
    rd = rs.normal(size=(n, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True), jnp.float32)

    h1, t1, tri1 = jax.jit(
        lambda ro, rd: bvh_mod.traverse(bvh, v0, e1, e2, ro, rd, 1e-5, 1e5)
    )(ro, rd)
    h2, t2, tri2 = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    hits = np.asarray(h1)
    np.testing.assert_allclose(
        np.asarray(t1)[hits], np.asarray(t2)[hits], rtol=1e-5, atol=1e-6
    )
    # same triangle modulo coplanar-edge ties
    assert (np.asarray(tri1)[hits] == np.asarray(tri2)[hits]).mean() > 0.99


def test_anyhit_traversal():
    verts, faces = make_sphere_mesh(8, 12)
    scene = _mesh_scene(verts, faces)
    bvh = bvh_mod.build_lbvh(scene.vertices, scene.faces)
    ordered = scene.faces[bvh.order]
    v = scene.vertices
    v0, e1, e2 = (
        v[ordered[:, 0]],
        v[ordered[:, 1]] - v[ordered[:, 0]],
        v[ordered[:, 2]] - v[ordered[:, 0]],
    )
    ro = jnp.asarray([[0, 0, 3.0], [0, 3.0, 0], [2.0, 2.0, 2.0]], jnp.float32)
    rd = jnp.asarray([[0, 0, -1.0], [1, 0, 0], [1, 0, 0]], jnp.float32)
    hit, _, _ = bvh_mod.traverse(bvh, v0, e1, e2, ro, rd, 1e-5, 1e5, any_hit=True)
    assert np.asarray(hit).tolist() == [True, False, False]


def test_mesh_scene_render_with_bvh(cornell_path):
    """config 2: cube.obj mesh scene rendered via the BVH backend."""
    import os

    scene_path = os.path.join(os.path.dirname(cornell_path), "..", "..", "scenes", "cube_mesh.json")
    scene, camera, cfg = load_tungsten(os.path.abspath(scene_path))
    assert scene.faces.shape[0] == 3 * 2 + 12 + 2  # 3 quads + cube mesh + light
    camera = camera._replace(resolution=(32, 32))
    cfg = cfg.replace(spp=4, max_bounces=4, estimator="pbrt")
    scene_j = jax.tree.map(jnp.asarray, scene)
    bvh = bvh_mod.build_lbvh(scene.vertices, scene.faces)
    img_bvh = np.asarray(render_image(scene_j, camera, cfg, backend="bvh", bvh=bvh))
    img_brute = np.asarray(render_image(scene_j, camera, cfg, backend="brute"))
    assert np.isfinite(img_bvh).all()
    assert img_bvh.mean() > 0.01
    # identical RNG + same hits -> nearly identical images
    close = np.isclose(img_bvh, img_brute, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99
