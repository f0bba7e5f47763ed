"""Inverse-rendering convergence: the end-to-end differentiability showcase.

Recovers the Cornell left wall's albedo from a rendered target by gradient
descent THROUGH the full path tracer (dist/render.py train_step — render,
L2 loss, grads, psum transpose over the mesh). The reference has no
autodiff at all; this is the SURVEY §7 north-star capability, previously
proven only at finite-difference granularity (tests/test_grad.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.dist.render import (
    make_mesh,
    pixel_grid,
    render_field_sharded,
    train_step,
)
from pyrenderer_tpu.scene import load_tungsten


@pytest.mark.slow
def test_albedo_recovery_converges(cornell_path):
    scene, camera, _ = load_tungsten(cornell_path)
    scene = jax.tree.map(jnp.asarray, scene)
    camera = camera._replace(resolution=(24, 24))
    cfg = RenderConfig(max_bounces=3, spp=2, seed=0, estimator="reference")
    mesh = make_mesh(1)
    px, py = pixel_grid(camera)

    target = render_field_sharded(scene, camera, cfg, mesh, px, py)

    alb = np.asarray(scene.albedo)
    wall = int(np.argmax(alb[:, 0] - alb[:, 1]))  # the reddest material
    true_albedo = alb[wall].copy()
    alb_init = alb.copy()
    alb_init[wall] = [0.5, 0.5, 0.5]
    params = (scene.vertices, jnp.asarray(alb_init), scene.emission)

    loss0 = None
    for _ in range(60):
        loss, params = train_step(
            params, scene, camera, cfg, mesh, target, px, py, (0.0, 30.0, 0.0)
        )
        if loss0 is None:
            loss0 = float(loss)
    loss = float(loss)

    assert loss < loss0 / 10, f"loss {loss0:.3e} -> {loss:.3e}: not converged"
    final = np.asarray(params[1])[wall]
    assert np.abs(final - true_albedo).max() < 0.05
    # untouched parameters stayed frozen
    np.testing.assert_array_equal(np.asarray(params[0]), np.asarray(scene.vertices))
    np.testing.assert_array_equal(np.asarray(params[2]), np.asarray(scene.emission))


@pytest.mark.slow
def test_recovery_on_multi_device_mesh(cornell_path):
    """Same recovery on the full virtual mesh: scene-parameter grads
    all-reduce over dp via the psum transpose and every device agrees."""
    scene, camera, _ = load_tungsten(cornell_path)
    scene = jax.tree.map(jnp.asarray, scene)
    camera = camera._replace(resolution=(16, 16))
    cfg = RenderConfig(max_bounces=2, spp=2, seed=0, estimator="reference")
    n = min(4, len(jax.devices()))
    mesh = make_mesh(n, dp=n, sp=1)
    px, py = pixel_grid(camera)
    target = render_field_sharded(scene, camera, cfg, mesh, px, py)

    alb = np.asarray(scene.albedo)
    wall = int(np.argmax(alb[:, 0] - alb[:, 1]))
    alb_init = alb.copy()
    alb_init[wall] = [0.4, 0.4, 0.4]
    params = (scene.vertices, jnp.asarray(alb_init), scene.emission)
    loss0 = None
    for _ in range(40):
        loss, params = train_step(
            params, scene, camera, cfg, mesh, target, px, py, (0.0, 30.0, 0.0)
        )
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 / 10
