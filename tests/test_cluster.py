"""Cluster accelerator tests: build, pure-JAX twin, Pallas kernel
(interpret mode), any-hit kernel, backend wiring, end-to-end render parity.

The cluster sweep is the large-scene TPU path (accel/clusters.py +
kernels/pallas_cluster.py) — the role the reference's BVH walk plays in
mathematics/intersection_taichi.py:256-287. Oracles: the O(N*T) brute
intersector and the pure-JAX cluster twin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.accel import clusters as cl
from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.kernels import pallas_cluster as pc
from pyrenderer_tpu.scene import procgen
from pyrenderer_tpu.scene.tungsten import build_scene, load_tungsten


@pytest.fixture(scope="module")
def terrain_scene():
    """Cornell walls + 8k-triangle procedural terrain (seeded)."""
    data = procgen.big_scene_data("terrain", res=64)
    scene, cam, cfg = build_scene(data, dtype=np.float32)
    return jax.tree.map(jnp.asarray, scene), cam, cfg


@pytest.fixture(scope="module")
def cs(terrain_scene):
    scene, _, _ = terrain_scene
    return cl.build_clusters(np.asarray(scene.vertices), np.asarray(scene.faces))


def _random_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    ro = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    ro[:, 1] += 1.0
    rd = rs.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_build_shapes(cs, terrain_scene):
    scene, _, _ = terrain_scene
    t = scene.faces.shape[0]
    k = cs.n_clusters
    assert k * cl.LANE_TRIS >= t
    assert k % cl.GROUP == 0
    assert cs.tri.shape == (k * cl.TRI_ROWS, cl.LANE_TRIS)
    # + GROUP trailing all-NaN rows: the dummy supercluster's children
    # (pair-peeled sweep's no-op second operand)
    assert cs.child_box.shape == (k + cl.GROUP, cl.LANE_TRIS)
    assert cs.dummy_super == k // cl.GROUP
    assert np.isnan(np.asarray(cs.child_box)[k:, 0:6]).all()
    assert cs.super_box.shape == (6, k // cl.GROUP)
    # every real face id appears exactly once among the non-duplicate slots
    order = np.asarray(cs.order)
    assert set(order.tolist()) >= set(range(t))


def test_cluster_boxes_contain_triangles(cs):
    """Each cluster's AABB bounds its packed (f32) triangles."""
    k = cs.n_clusters
    tri = np.asarray(cs.tri).reshape(k, cl.TRI_ROWS, cl.LANE_TRIS)
    v0 = tri[:, 0:3]
    v1 = v0 + tri[:, 3:6]
    v2 = v0 + tri[:, 6:9]
    pts = np.stack([v0, v1, v2], axis=1)           # (K, 3verts, 3comps, 128)
    cmin = np.asarray(cs.child_box)[:k, 0:3]
    cmax = np.asarray(cs.child_box)[:k, 3:6]
    real = np.isfinite(cmin).all(axis=1)
    lo = pts.min(axis=(1, 3))
    hi = pts.max(axis=(1, 3))
    assert (lo[real] >= cmin[real] - 1e-6).all()
    assert (hi[real] <= cmax[real] + 1e-6).all()
    # supercluster boxes bound their children
    s = k // cl.GROUP
    smin = np.asarray(cs.super_box)[0:3].T          # (S, 3)
    smax = np.asarray(cs.super_box)[3:6].T
    cmin_g = np.where(real[:, None], cmin, np.inf).reshape(s, cl.GROUP, 3)
    cmax_g = np.where(real[:, None], cmax, -np.inf).reshape(s, cl.GROUP, 3)
    assert (cmin_g.min(axis=1) >= smin - 1e-6).all()
    assert (cmax_g.max(axis=1) <= smax + 1e-6).all()


def test_ref_twin_matches_brute(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(1024)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_r, t_r, slot = cl.closest_hit_ref(cs, ro, rd, 1e-5, 1e5)
    f_r = cl.slot_to_face(cs, slot)
    assert np.array_equal(np.asarray(h_r), np.asarray(h_b))
    hits = np.asarray(h_b)
    same = (np.asarray(f_r) == np.asarray(f_b)) & hits
    assert same[hits].mean() > 0.995               # fp ties on shared edges
    np.testing.assert_allclose(
        np.asarray(t_r)[hits], np.asarray(t_b)[hits], rtol=1e-4
    )


def test_pallas_interpret_matches_brute(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(512, seed=3)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_p, t_p, f_p = pc.closest_hit(cs, ro, rd, 1e-5, 1e5, interpret=True)
    assert np.array_equal(np.asarray(h_p), np.asarray(h_b))
    hits = np.asarray(h_b)
    same = (np.asarray(f_p) == np.asarray(f_b)) & hits
    assert same[hits].mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(t_p)[hits], np.asarray(t_b)[hits], rtol=1e-4
    )


def test_pallas_sorted_and_padded(cs, terrain_scene):
    """Coherence sort + non-multiple-of-128 ray counts scatter back right."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(300, seed=5)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_p, t_p, f_p = pc.closest_hit(cs, ro, rd, 1e-5, 1e5, sort=True,
                                   interpret=True)
    assert h_p.shape == (300,)
    assert np.array_equal(np.asarray(h_p), np.asarray(h_b))
    hits = np.asarray(h_b)
    same = (np.asarray(f_p) == np.asarray(f_b)) & hits
    assert same[hits].mean() > 0.995


def test_pallas_suspend_resume_rounds(cs, terrain_scene):
    """Budgeted pass 1 + compacting resume pass must be EXACT: identical
    hit set to the unbudgeted sweep for incoherent rays, even with a
    budget so small that most tiles suspend."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(512, seed=13)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    for budget in (2, 4):
        h_p, t_p, f_p = pc.closest_hit(
            cs, ro, rd, 1e-5, 1e5, sort=True, interpret=True,
            rounds=2, budget=budget,
        )
        assert np.array_equal(np.asarray(h_p), np.asarray(h_b)), budget
        hits = np.asarray(h_b)
        same = (np.asarray(f_p) == np.asarray(f_b)) & hits
        assert same[hits].mean() > 0.995, budget
        np.testing.assert_allclose(
            np.asarray(t_p)[hits], np.asarray(t_b)[hits], rtol=1e-4
        )


def test_anyhit_kernel(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(512, seed=7)
    for t1 in (0.5, 2.0):
        occ_b = np.asarray(isect.occluded(scene, ro, rd, 1e-5, t1))
        occ_p = np.asarray(pc.occluded(cs, ro, rd, 1e-5, t1, interpret=True))
        assert (occ_b == occ_p).mean() > 0.995


def test_anyhit_per_ray_t1(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(256, seed=9)
    t1 = jnp.asarray(np.random.RandomState(1).uniform(0.1, 3.0, 256), jnp.float32)
    occ_b = np.asarray(isect.occluded(scene, ro, rd, 1e-5, t1))
    occ_p = np.asarray(pc.occluded(cs, ro, rd, 1e-5, t1, interpret=True))
    assert (occ_b == occ_p).mean() > 0.995


def test_backend_resolution_and_auto_build():
    from pyrenderer_tpu.core.integrator import (
        AUTO_BRUTE_MAX_TRIS,
        maybe_build_accel,
        resolve_backend,
    )
    from pyrenderer_tpu.accel.bvh import FlatBVH

    data = procgen.big_scene_data("terrain", res=64)
    scene, cam, cfg = build_scene(data, dtype=np.float32)
    assert scene.faces.shape[0] > AUTO_BRUTE_MAX_TRIS
    accel = maybe_build_accel(scene, "auto")
    # on CPU auto resolves to bvh; on TPU to cluster
    expected = "cluster" if jax.default_backend() == "tpu" else "bvh"
    assert resolve_backend("auto", scene.faces.shape[0], accel) == expected
    assert isinstance(accel, (cl.ClusterScene, FlatBVH))
    # explicit cluster build
    accel_c = maybe_build_accel(scene, "cluster")
    assert isinstance(accel_c, cl.ClusterScene)
    # explicit backend strings pass through
    assert resolve_backend("cluster", 10, None) == "cluster"
    assert resolve_backend("brute", 10 ** 6, None) == "brute"


def test_render_cluster_backend_matches_brute(terrain_scene):
    """End-to-end 32x32 render through the public API: cluster backend
    (pure-JAX twin on CPU) vs brute, identical RNG -> near-identical image."""
    from pyrenderer_tpu.core.integrator import maybe_build_accel, render_image

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(32, 32))
    cfg = cfg.replace(spp=2, max_bounces=3)
    accel = maybe_build_accel(jax.tree.map(np.asarray, scene), "cluster")
    img_c = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    img_b = np.asarray(render_image(scene, cam, cfg, backend="brute"))
    assert np.isfinite(img_c).all()
    # identical sample decisions except fp-tie faces: images agree closely
    close = np.isclose(img_c, img_b, rtol=1e-3, atol=1e-4).mean()
    assert close > 0.99


def test_cluster_small_scene_cornell(cornell_path):
    """Cluster path works on the 36-tri Cornell box too (single cluster)."""
    scene, cam, cfg = load_tungsten(cornell_path, dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    cs = cl.build_clusters(np.asarray(scene.vertices), np.asarray(scene.faces))
    assert cs.n_superclusters == 1
    ro, rd = _random_rays(256, seed=11)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_p, t_p, f_p = pc.closest_hit(cs, ro, rd, 1e-5, 1e5, interpret=True)
    assert np.array_equal(np.asarray(h_p), np.asarray(h_b))
    hits = np.asarray(h_b)
    # ties on shared quad diagonals resolve by Morton slot here vs face
    # index in brute — faces may differ but t always agrees (up to the
    # kernel's documented 2^-17 relative rounding of returned t)
    np.testing.assert_allclose(
        np.asarray(t_p)[hits], np.asarray(t_b)[hits], rtol=1e-4
    )
    same = (np.asarray(f_p) == np.asarray(f_b)) & hits
    assert same[hits].mean() > 0.97


def test_grad_flows_with_cluster_backend(terrain_scene):
    """stop_gradient boundary: grad w.r.t. albedo works through the cluster
    backend (selection detached, shading re-evaluated differentiably)."""
    from pyrenderer_tpu.core.integrator import maybe_build_accel, render_block

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(8, 8))
    cfg = cfg.replace(spp=1, max_bounces=2)
    accel = maybe_build_accel(jax.tree.map(np.asarray, scene), "cluster")
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    px = px.reshape(-1).astype(jnp.int32)
    py = py.reshape(-1).astype(jnp.int32)

    def loss(albedo):
        s = scene._replace(albedo=albedo)
        img = render_block(s, cam, cfg, 0, 1, px, py, "cluster", accel)
        return jnp.sum(img)

    g = jax.grad(loss)(scene.albedo)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_render_cluster_backend_pbrt_estimator(terrain_scene):
    """The pbrt estimator composed with the cluster accelerator (round-3
    weakness: the two headline features were never explicitly tested
    together): 32x32 end-to-end render, cluster vs brute, identical RNG."""
    from pyrenderer_tpu.core.integrator import maybe_build_accel, render_image

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(32, 32))
    cfg = cfg.replace(spp=2, max_bounces=3, estimator="pbrt")
    accel = maybe_build_accel(jax.tree.map(np.asarray, scene), "cluster")
    img_c = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    img_b = np.asarray(render_image(scene, cam, cfg, backend="brute"))
    assert np.isfinite(img_c).all()
    assert img_c.max() > 0
    close = np.isclose(img_c, img_b, rtol=1e-3, atol=1e-4).mean()
    assert close > 0.99


def test_cluster_adversarial_geometry():
    """Degenerate/hostile inputs through build + traversal: zero-area
    triangles, duplicated faces, coincident vertices, a huge-coordinate
    outlier — build must not crash, padding guards must hold, and the
    kernel must agree with the brute oracle."""
    rs = np.random.RandomState(0)
    pts = rs.uniform(-1, 1, (600, 3)).astype(np.float32)
    pts[7] = pts[3]                                   # coincident vertices
    pts[11] = [1e6, 1e6, 1e6]                         # far outlier vertex
    faces = rs.randint(0, 600, (700, 3)).astype(np.int32)
    faces[5] = [3, 3, 3]                              # zero-area (point)
    faces[6] = [4, 4, 9]                              # zero-area (edge)
    faces[10] = faces[20]                             # duplicate face
    from pyrenderer_tpu.scene.types import Scene

    t = faces.shape[0]
    scene = Scene(
        vertices=jnp.asarray(pts), faces=jnp.asarray(faces),
        normal_sign=jnp.ones(t, jnp.float32),
        face_material=jnp.zeros(t, jnp.int32),
        albedo=jnp.full((1, 3), 0.5, jnp.float32),
        emissive=jnp.zeros(1, jnp.float32),
        emission=jnp.zeros((1, 3), jnp.float32),
        sided=jnp.zeros(1, jnp.float32),
        mat_type=jnp.zeros(1, jnp.int32),
        ior=jnp.ones(1, jnp.float32),
        roughness=jnp.zeros(1, jnp.float32),
        light_faces=jnp.zeros((1, 1), jnp.int32),
        light_nfaces=jnp.ones(1, jnp.int32),
    )
    cs = cl.build_clusters(pts, faces)
    ro, rd = _random_rays(256, seed=17)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_p, t_p, f_p = pc.closest_hit(cs, ro, rd, 1e-5, 1e5, sort=True,
                                   interpret=True)
    h_b, h_p = np.asarray(h_b), np.asarray(h_p)
    # triangles touching the 1e6 outlier are catastrophically conditioned
    # in f32 — brute and the pure-JAX twin disagree with each other there
    # too, so those rays only need statistical agreement; everything not
    # involving the outlier must match exactly
    outlier_faces = np.nonzero((np.asarray(faces) == 11).any(axis=1))[0]
    touched = np.isin(np.asarray(f_b), outlier_faces) | np.isin(
        np.asarray(f_p), outlier_faces)
    assert np.array_equal(h_p[~touched], h_b[~touched])
    assert (h_p == h_b).mean() > 0.95
    both = h_b & h_p & ~touched
    if both.any():
        np.testing.assert_allclose(
            np.asarray(t_p)[both], np.asarray(t_b)[both], rtol=1e-3
        )
    occ_b = np.asarray(isect.occluded(scene, ro, rd, 1e-5, 1.5))
    occ_p = np.asarray(pc.occluded(cs, ro, rd, 1e-5, 1.5, interpret=True))
    assert (occ_b == occ_p).mean() > 0.99


def test_vmem_guard_rejects_oversized_scenes():
    """Scenes whose cluster tables exceed the measured VMEM ceiling get an
    actionable error pointing at geometry sharding, instead of the opaque
    remote-compiler failure probed on chip (200k tris ok, 327k dies)."""
    from pyrenderer_tpu.kernels.pallas_cluster import _check_vmem
    from pyrenderer_tpu.scene.procgen import blob

    verts, faces = blob(7)                 # 327,680 tris = 21.3 MiB tables
    cs = cl.build_clusters(verts, faces)
    with pytest.raises(ValueError, match="VMEM.*shard the"):
        _check_vmem(cs)
    # the pure-JAX fallback path (CPU) is size-unlimited and must still work
    ro, rd = _random_rays(64, seed=19)
    hit, t, f = pc.closest_hit(cs, ro, rd, 1e-5, 1e5)
    assert np.isfinite(np.asarray(t)).all()


def test_wavefront_sort_optin_matches_default(terrain_scene, monkeypatch):
    """The opt-in integrator-level wavefront sort (PYRENDERER_WF_SORT=1,
    kept for re-evaluation after it measured slower on chip) must stay
    CORRECT: identical per-pixel radiance to the default per-query path —
    pixel ids travel with their sorted lanes and the RNG is keyed on them,
    so only the work order may differ."""
    from pyrenderer_tpu.core.integrator import maybe_build_accel, render_image

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(24, 24))
    # force sorting on regardless of scene size so the wf path activates
    cfg = cfg.replace(spp=2, max_bounces=3, cluster_sort=True)
    accel = maybe_build_accel(jax.tree.map(np.asarray, scene), "cluster")
    img_default = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    monkeypatch.setenv("PYRENDERER_WF_SORT", "1")
    img_wf = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    np.testing.assert_allclose(img_wf, img_default, rtol=1e-5, atol=1e-7)

    # pbrt estimator through the same opt-in path
    cfgp = cfg.replace(estimator="pbrt")
    img_wf_p = np.asarray(
        render_image(scene, cam, cfgp, backend="cluster", accel=accel)
    )
    monkeypatch.delenv("PYRENDERER_WF_SORT")
    img_p = np.asarray(
        render_image(scene, cam, cfgp, backend="cluster", accel=accel)
    )
    np.testing.assert_allclose(img_wf_p, img_p, rtol=1e-5, atol=1e-7)


def test_all_knobs_composed(cs, terrain_scene):
    """Every cluster feature at once — sort + watertight leaves +
    suspend/resume rounds through the compiled-kernel semantics
    (interpret) — against the watertight whole-table oracle."""
    from pyrenderer_tpu.core.watertight import intersect_watertight

    scene, _, _ = terrain_scene
    ro, rd = _random_rays(384, seed=23)
    h_o, t_o, f_o = intersect_watertight(scene, ro, rd, 1e-5, 1e5)
    h_k, t_k, f_k = pc.closest_hit(
        cs, ro, rd, 1e-5, 1e5, sort=True, watertight=True,
        rounds=2, budget=4, interpret=True,
    )
    h_o, h_k = np.asarray(h_o), np.asarray(h_k)
    assert (h_o == h_k).mean() > 0.995
    both = h_o & h_k
    np.testing.assert_allclose(
        np.asarray(t_k)[both], np.asarray(t_o)[both], rtol=1e-4
    )


# ---------------------------------------------------------------------------
# chunked sweep (ClusterChunks): the VMEM-oversize capacity default
# ---------------------------------------------------------------------------

def test_chunked_sweep_matches_brute(terrain_scene):
    """Sequential per-chunk sweeps with the carried t-bound must be exact
    (global face ids, per-ray t1, occlusion). Chip A/B in
    perf/chunkedsweep.py showed this beats HBM streaming 2.9-4.1x at
    330k-500k tris; here the terrain is force-split into 3 chunks."""
    from pyrenderer_tpu.accel.clusters import (
        ClusterChunks,
        build_chunked_clusters,
    )
    from pyrenderer_tpu.core import intersect as isect
    from pyrenderer_tpu.kernels import pallas_cluster as pc

    scene, _, _ = terrain_scene
    cc = build_chunked_clusters(
        np.asarray(scene.vertices), np.asarray(scene.faces), max_tris=3000
    )
    assert isinstance(cc, ClusterChunks) and len(cc.chunks) == 3
    rs = np.random.RandomState(1)
    n = 384
    ro = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    ro[:, 1] += 1.0
    rd = rs.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_c, t_c, f_c = pc.closest_hit_chunked(cc, ro, rd, 1e-5, 1e5)
    assert np.array_equal(np.asarray(h_c), np.asarray(h_b))
    hits = np.asarray(h_b)
    assert ((np.asarray(f_c) == np.asarray(f_b)) & hits)[hits].mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(t_c)[hits], np.asarray(t_b)[hits], rtol=1e-4
    )
    t1 = jnp.asarray(rs.uniform(0.1, 3.0, n), jnp.float32)
    occ_b = np.asarray(isect.occluded(scene, ro, rd, 1e-5, t1))
    occ_c = np.asarray(pc.occluded_chunked(cc, ro, rd, 1e-5, t1))
    assert np.array_equal(occ_b, occ_c)


def test_chunked_routing_and_render(terrain_scene):
    """resolve_backend routes a ClusterChunks accel to cluster_chunked and
    the full render matches the monolithic cluster backend."""
    from pyrenderer_tpu.accel.clusters import build_chunked_clusters
    from pyrenderer_tpu.core.integrator import (
        maybe_build_accel,
        render_image,
        resolve_backend,
    )

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(16, 16))
    cfg = cfg.replace(spp=1, max_bounces=2)
    cc = build_chunked_clusters(
        np.asarray(scene.vertices), np.asarray(scene.faces), max_tris=3000
    )
    assert resolve_backend("auto", scene.faces.shape[0], cc) \
        == "cluster_chunked"
    accel_mono = maybe_build_accel(jax.tree.map(np.asarray, scene), "cluster")
    img_mono = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel_mono)
    )
    img_chunk = np.asarray(
        render_image(scene, cam, cfg, backend="cluster_chunked", accel=cc)
    )
    assert np.isfinite(img_chunk).all()
    close = np.isclose(img_chunk, img_mono, rtol=1e-4, atol=1e-6).mean()
    assert close > 0.99
