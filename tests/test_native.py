"""Native C++ SAH BVH builder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu import native
from pyrenderer_tpu.accel import bvh as bvh_mod
from tests.test_bvh import _mesh_scene, make_sphere_mesh


def test_native_library_builds():
    lib = native.load_library()
    assert lib is not None, "g++ compile of bvh_builder.cpp failed"


def test_sah_structure_and_traversal_agreement():
    verts, faces = make_sphere_mesh(16, 24)
    scene = _mesh_scene(verts, faces)
    sah = bvh_mod.build_bvh(verts, faces, method="sah")
    lbvh = bvh_mod.build_lbvh(verts, faces)

    # leaves cover every triangle once
    first = np.asarray(sah.first)
    count = np.asarray(sah.count)
    covered = []
    for i in range(sah.n_nodes):
        if count[i] > 0:
            covered.extend(range(first[i], first[i] + count[i]))
    assert sorted(np.asarray(sah.order)[covered].tolist()) == list(
        range(faces.shape[0])
    )
    escape = np.asarray(sah.escape)
    assert escape[0] == -1
    assert all(e == -1 or e > i for i, e in enumerate(escape))

    # identical hits through both trees
    def tris(b):
        ordered = scene.faces[b.order]
        v = scene.vertices
        v0 = v[ordered[:, 0]]
        return v0, v[ordered[:, 1]] - v0, v[ordered[:, 2]] - v0

    rs = np.random.RandomState(1)
    n = 256
    ro = jnp.asarray(rs.uniform(-2, 2, (n, 3)), jnp.float32)
    rd = rs.normal(size=(n, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True), jnp.float32)
    h1, t1, tri1 = bvh_mod.traverse(sah, *tris(sah), ro, rd, 1e-5, 1e5)
    h2, t2, tri2 = bvh_mod.traverse(lbvh, *tris(lbvh), ro, rd, 1e-5, 1e5)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    hits = np.asarray(h1)
    np.testing.assert_allclose(np.asarray(t1)[hits], np.asarray(t2)[hits], rtol=1e-5)


def test_sah_quality_not_worse():
    """SAH should touch no more nodes than the LBVH on average (coarse
    proxy: sum of leaf-subtree surface areas weighted by counts)."""
    verts, faces = make_sphere_mesh(16, 24)
    sah = bvh_mod.build_bvh(verts, faces, method="sah")
    lbvh = bvh_mod.build_lbvh(verts, faces)

    def cost(b):
        mn = np.asarray(b.bbox_min)
        mx = np.asarray(b.bbox_max)
        d = np.maximum(mx - mn, 0)
        sa = 2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
        return sa.sum()

    assert cost(sah) <= cost(lbvh) * 1.1


def test_cluster_order_native_matches_python():
    """The C++ median-split orderer must be bit-identical to the Python
    recursion (same stable sorts, same round-half-to-even split points) —
    they are interchangeable build paths for ClusterScene."""
    import numpy as np
    from pyrenderer_tpu.native import cluster_median_order_native
    from pyrenderer_tpu.scene.procgen import terrain

    for res, leaf in [(64, 128), (97, 128), (64, 32)]:
        verts, faces = terrain(res)
        v = np.asarray(verts, np.float64)
        f = np.asarray(faces, np.int64)
        tri = v[f]
        cent = 0.5 * (tri.min(axis=1) + tri.max(axis=1))

        native = cluster_median_order_native(cent, leaf)
        assert native is not None, "native cluster orderer failed to build"

        # the pure-Python recursion, inlined from accel/clusters.py
        def split(idx):
            if idx.shape[0] <= leaf:
                return [idx]
            c = cent[idx]
            ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            idx = idx[np.argsort(c[:, ax], kind="stable")]
            half = idx.shape[0] // 2
            half = max(leaf, int(round(half / leaf)) * leaf)
            return split(idx[:half]) + split(idx[half:])

        py = np.concatenate(split(np.arange(cent.shape[0], dtype=np.int64)))
        assert np.array_equal(native, py), (res, leaf)


def test_build_clusters_uses_native_order(monkeypatch):
    """build_clusters goes through _median_split_order which prefers the
    native path; sanity: the built ClusterScene is identical either way."""
    import numpy as np
    import jax
    from pyrenderer_tpu import native
    from pyrenderer_tpu.accel.clusters import build_clusters
    from pyrenderer_tpu.scene.procgen import terrain

    verts, faces = terrain(48)
    cs_native = build_clusters(verts, faces)
    monkeypatch.setattr(native, "cluster_median_order_native",
                        lambda cent, leaf: None)
    cs_python = build_clusters(verts, faces)
    for a, b in zip(jax.tree.leaves(cs_native), jax.tree.leaves(cs_python)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
