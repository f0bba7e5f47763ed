"""BASELINE config 4: pixel-gradients w.r.t. albedo/emission/vertices vs
finite differences.

With the counter-based RNG, the fixed-seed estimator is a deterministic
function of the scene parameters; as long as a perturbation flips no
discrete decision (hit ids, visibility), central finite differences of the
SAME estimator converge to the analytic detached-sampling gradient.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core.integrator import TraceTables, render_sample
from pyrenderer_tpu.scene.tungsten import load_tungsten


@pytest.fixture(scope="module")
def setup64(cornell_path):
    scene, camera, _ = load_tungsten(cornell_path, dtype=np.float64)
    camera = camera._replace(resolution=(12, 12))
    ys, xs = np.mgrid[0:12, 0:12]
    return scene, camera, xs.reshape(-1).astype(np.int32), ys.reshape(-1).astype(np.int32)


def _loss_fn(scene, camera, cfg, px, py):
    def loss(vertices, albedo, emission):
        s = scene._replace(vertices=vertices, albedo=albedo, emission=emission)
        total = 0.0
        for smp in range(cfg.spp):
            total = total + render_sample(
                s, camera, cfg, cfg.seed, jnp.uint32(smp), px, py
            ).sum()
        return total / cfg.spp

    return loss


@pytest.mark.parametrize("estimator", ["reference", "pbrt"])
def test_grad_albedo_vs_fd(setup64, estimator):
    scene, camera, px, py = setup64
    cfg = RenderConfig(max_bounces=3, spp=2, seed=5, estimator=estimator)
    with jax.enable_x64(True):
        s = jax.tree.map(jnp.asarray, scene)
        px_j, py_j = jnp.asarray(px), jnp.asarray(py)
        loss = _loss_fn(s, camera, cfg, px_j, py_j)
        g = jax.grad(loss, argnums=1)(s.vertices, s.albedo, s.emission)
        g = np.asarray(g)
        # FD on a handful of albedo entries
        eps = 1e-5
        rs = np.random.RandomState(0)
        checked = 0
        for mi, ci in [(0, 0), (2, 1), (5, 2), (6, 0)]:
            a_p = s.albedo.at[mi, ci].add(eps)
            a_m = s.albedo.at[mi, ci].add(-eps)
            fd = (loss(s.vertices, a_p, s.emission) - loss(s.vertices, a_m, s.emission)) / (
                2 * eps
            )
            fd = float(fd)
            if abs(fd) > 1e-6:
                np.testing.assert_allclose(g[mi, ci], fd, rtol=1e-5)
                checked += 1
        assert checked >= 3


def test_grad_emission_vs_fd(setup64):
    scene, camera, px, py = setup64
    cfg = RenderConfig(max_bounces=3, spp=2, seed=5, estimator="pbrt")
    with jax.enable_x64(True):
        s = jax.tree.map(jnp.asarray, scene)
        loss = _loss_fn(s, camera, cfg, jnp.asarray(px), jnp.asarray(py))
        g = np.asarray(jax.grad(loss, argnums=2)(s.vertices, s.albedo, s.emission))
        light_mat = int(np.asarray(scene.face_material)[-1])
        eps = 1e-4
        e_p = s.emission.at[light_mat, 0].add(eps)
        e_m = s.emission.at[light_mat, 0].add(-eps)
        fd = float(
            (loss(s.vertices, s.albedo, e_p) - loss(s.vertices, s.albedo, e_m)) / (2 * eps)
        )
        assert fd > 0  # more emission -> brighter
        np.testing.assert_allclose(g[light_mat, 0], fd, rtol=1e-5)


@pytest.mark.parametrize("estimator", ["reference", "pbrt"])
def test_grad_vertices_vs_fd(setup64, estimator):
    """Detached-sampling vertex gradient: matches FD when no discrete flip.
    Perturbing the back wall's z moves hit distances and NEE geometry."""
    scene, camera, px, py = setup64
    cfg = RenderConfig(max_bounces=2, spp=1, seed=5, estimator=estimator)
    with jax.enable_x64(True):
        s = jax.tree.map(jnp.asarray, scene)
        loss = _loss_fn(s, camera, cfg, jnp.asarray(px), jnp.asarray(py))
        g = np.asarray(jax.grad(loss, argnums=0)(s.vertices, s.albedo, s.emission))
        # back wall vertices: faces 4,5 -> vertex ids from scene.faces
        back_vids = np.unique(np.asarray(scene.faces)[4:6])
        eps = 1e-6
        agree = 0
        total = 0
        for vid in back_vids:
            for ci in range(3):
                v_p = s.vertices.at[vid, ci].add(eps)
                v_m = s.vertices.at[vid, ci].add(-eps)
                fd = float(
                    (loss(v_p, s.albedo, s.emission) - loss(v_m, s.albedo, s.emission))
                    / (2 * eps)
                )
                an = g[vid, ci]
                if abs(fd) < 1e-4 and abs(an) < 1e-4:
                    continue
                total += 1
                if np.isclose(an, fd, rtol=5e-3, atol=1e-4):
                    agree += 1
        assert total >= 4
        # allow a minority of entries to disagree (FD straddling a discrete
        # boundary); the detached gradient must match on the bulk
        assert agree / total >= 0.75
