"""Validation for the analytic-primitive tracer (pyrenderer_tpu/analytic.py).

The reference's taichi_ref.py is its most algorithmically complete
integrator (MIS at taichi_ref.py:368-397, three materials at :408-434);
this file pins down the repo's counterpart:

  - intersector fuzz vs independent float64 NumPy oracles (the pattern of
    the reference's debug/run.py differential intersector test);
  - the MIS direct-light estimator vs a brute-force area-integral Monte
    Carlo oracle at a hand-placed unoccluded floor point — this checks the
    power-heuristic weighting end to end, not just that pixels look right;
  - a tiny end-to-end render: finite, red wall left / green wall right,
    light region brightest (taichi_ref.py:441-491);
  - the sqrt(100x) display transform convention (taichi_ref.py:487-491).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyrenderer_tpu import analytic as an


def _rand_rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-2.0, 2.0, (n, 3))
    rd = rng.standard_normal((n, 3))
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


def test_sphere_matches_quadratic_oracle():
    n = 2048
    ro, rd = _rand_rays(n, 1)
    center = np.asarray(an.SP1_CENTER)
    r = an.SP1_RADIUS
    # aim half the rays at points near the sphere so the hit set is dense
    rng = np.random.default_rng(11)
    aim = center + rng.uniform(-1.5 * r, 1.5 * r, (n // 2, 3))
    rd[: n // 2] = aim - ro[: n // 2]
    rd[: n // 2] /= np.linalg.norm(rd[: n // 2], axis=1, keepdims=True)

    t, hit_pos = an.intersect_sphere(
        jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32), center, r
    )
    t = np.asarray(t)

    # float64 oracle: smallest positive root of |o + t d - c|^2 = r^2
    oc = ro - center
    b = 2.0 * np.sum(oc * rd, axis=1)
    c = np.sum(oc * oc, axis=1) - r * r
    delta = b * b - 4.0 * c
    has = delta > 0
    sq = np.sqrt(np.maximum(delta, 0.0))
    t0 = 0.5 * (-b - sq)
    t1 = 0.5 * (-b + sq)
    t_oracle = np.where(t0 > 0, t0, t1)
    expect_hit = has & (t_oracle > 1e-3)

    got_hit = t < an.INF
    # ignore grazing rays where f32 vs f64 legitimately disagree
    grazing = np.abs(delta) < 1e-3
    agree = (got_hit == expect_hit) | grazing
    assert agree.mean() > 0.995

    both = got_hit & expect_hit & ~grazing
    assert both.sum() > 50
    np.testing.assert_allclose(t[both], t_oracle[both], rtol=2e-3, atol=2e-3)
    # hit point sits on the sphere
    hp = np.asarray(hit_pos)[both]
    np.testing.assert_allclose(
        np.linalg.norm(hp - center, axis=1), r, rtol=3e-3
    )


def test_plane_matches_oracle():
    n = 1024
    ro, rd = _rand_rays(n, 2)
    point, normal = (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
    t = np.asarray(
        an.intersect_plane(
            jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
            point, normal,
        )
    )
    denom = rd[:, 1]
    t_oracle = np.where(np.abs(denom) > an.EPS, -ro[:, 1] / denom, np.inf)
    expect = (t_oracle > 0) & np.isfinite(t_oracle)
    got = t < an.INF
    assert (got == expect).mean() > 0.999
    both = got & expect
    np.testing.assert_allclose(t[both], t_oracle[both], rtol=1e-4, atol=1e-5)


def test_aabb_matches_slab_oracle():
    n = 4096
    ro, rd = _rand_rays(n, 3)
    bmin = np.asarray([-0.4, -0.2, -0.6])
    bmax = np.asarray([0.5, 0.7, 0.3])
    hit, t_near, t_far, normal = an.intersect_aabb(
        jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32), bmin, bmax
    )
    hit, t_near, normal = np.asarray(hit), np.asarray(t_near), np.asarray(normal)

    with np.errstate(divide="ignore", invalid="ignore"):
        i1 = (bmin - ro) / rd
        i2 = (bmax - ro) / rd
    near = np.fmin(i1, i2)
    far = np.fmax(i1, i2)
    # parallel-axis handling identical to the kernel's explicit mask
    inside = (ro >= bmin) & (ro <= bmax)
    near = np.where(np.abs(rd) < 1e-300, -np.inf, near)
    far = np.where(np.abs(rd) < 1e-300, np.inf, far)
    tn = near.max(axis=1)
    tf = far.min(axis=1)
    expect = (tn <= tf) & ~((np.abs(rd) < 1e-300) & ~inside).any(axis=1)

    # skip near-degenerate boundary cases
    clear = np.abs(tn - tf) > 1e-4
    assert ((hit == expect) | ~clear).mean() > 0.998
    both = hit & expect & clear
    assert both.sum() > 200
    np.testing.assert_allclose(t_near[both], tn[both], rtol=1e-3, atol=1e-4)

    # entry normal: axis of the max near-plane, signed against the ray
    axis = near.argmax(axis=1)
    for i in np.nonzero(both)[0][:300]:
        a = axis[i]
        assert abs(abs(normal[i, a]) - 1.0) < 1e-6
        assert normal[i].sum() == normal[i, a]  # one-hot
        # entering face: normal opposes the ray component on that axis
        assert normal[i, a] * rd[i, a] < 0


def test_transformed_aabb_hit_on_local_surface():
    n = 2048
    ro, rd = _rand_rays(n, 4)
    hit, t, n_w = an.intersect_aabb_transformed(
        jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
        an.BOX_MIN, an.BOX_MAX, an._BOX_M_INV, an._BOX_M_INV_T,
    )
    hit, t = np.asarray(hit), np.asarray(t)
    assert hit.sum() > 20
    p = ro + t[:, None] * rd
    m_inv = np.asarray(an._BOX_M_INV, np.float64)
    p_local = p @ m_inv[:3, :3].T + m_inv[:3, 3]
    bmin, bmax = np.asarray(an.BOX_MIN), np.asarray(an.BOX_MAX)
    for i in np.nonzero(hit)[0]:
        pl = p_local[i]
        assert (pl > bmin - 1e-3).all() and (pl < bmax + 1e-3).all()
        # on the boundary: some axis within tol of a face
        d_face = np.minimum(np.abs(pl - bmin), np.abs(pl - bmax)).min()
        assert d_face < 1e-3
    # world normal is unit length where hit
    nn = np.linalg.norm(np.asarray(n_w)[hit], axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-3)


def test_mis_direct_light_matches_area_integral():
    """sample_direct_light at an unoccluded lambert floor point equals the
    analytic area integral of the light (MC oracle, f64): MIS weights must
    sum both strategies to exactly one integral's worth."""
    p_np = np.asarray([0.3, 0.0, 1.0])
    nrm_np = np.asarray([0.0, 1.0, 0.0])
    albedo = np.asarray([0.93, 0.93, 0.93])

    # oracle: uniform area sampling of the light rectangle, 400k samples
    rng = np.random.default_rng(5)
    m = 400_000
    lx = rng.uniform(an.LIGHT_X_MIN, an.LIGHT_X_MIN + an.LIGHT_X_RANGE, m)
    lz = rng.uniform(an.LIGHT_Z_MIN, an.LIGHT_Z_MIN + an.LIGHT_Z_RANGE, m)
    lp = np.stack([lx, np.full(m, an.LIGHT_Y), lz], axis=1)
    d = lp - p_np
    dist2 = (d * d).sum(axis=1)
    wd = d / np.sqrt(dist2)[:, None]
    cos_s = np.maximum(0.0, wd[:, 1])           # surface normal +y
    # light normal (0,-1,0) vs direction light->surface (= -wd): cos = +wd_y
    cos_l = np.maximum(0.0, wd[:, 1])
    g = cos_s * cos_l / dist2
    lc = np.asarray(an.LIGHT_COLOR)
    oracle = (albedo / np.pi) * lc * an.LIGHT_AREA * g.mean()

    # estimator: many independent RNG streams at the same point
    n = 8192
    p = jnp.broadcast_to(jnp.asarray(p_np, jnp.float32), (n, 3))
    nrm = jnp.broadcast_to(jnp.asarray(nrm_np, jnp.float32), (n, 3))
    col = jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (n, 3))
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros(n, jnp.uint32)
    li = np.asarray(
        an.sample_direct_light(p, nrm, col, pixel, sample, 0, 7)
    )
    assert np.isfinite(li).all()
    est = li.mean(axis=0)
    np.testing.assert_allclose(est, oracle, rtol=0.05)


def test_render_smoke_walls_and_light():
    hdr = np.asarray(an.render(res=(24, 24), spp=1, seed=0, max_depth=3))
    assert hdr.shape == (24, 24, 3)
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0

    ldr = np.asarray(an.tonemap(jnp.asarray(hdr)))
    left = ldr[:, :6].mean(axis=(0, 1))
    right = ldr[:, -6:].mean(axis=(0, 1))
    assert left[0] > left[1] * 1.15    # red wall dominates on the left
    assert right[1] > right[0] * 1.15  # green wall dominates on the right


def test_tonemap_convention():
    hdr = jnp.asarray([[0.0, 0.01, 1.0]])
    out = np.asarray(an.tonemap(hdr))
    np.testing.assert_allclose(out, np.sqrt([[0.0, 1.0, 100.0]]), rtol=1e-6)


@pytest.mark.slow
def test_mis_self_consistency_across_spp():
    """Unbiasedness smoke: mean image radiance at two sample counts agrees
    (same estimator, independent strata/streams)."""
    # 25 = one full 5x5 stratum cover (camera_rays picks strata by pass
    # index): partial covers bias the pixel-footprint sampling
    lo = np.asarray(an.render(res=(12, 12), spp=25, seed=0, max_depth=4))
    hi = np.asarray(an.render(res=(12, 12), spp=50, seed=3, max_depth=4))
    assert np.isfinite(lo).all() and np.isfinite(hi).all()
    # compare tonemapped means: sqrt compresses the heavy-tailed caustic
    # outliers that dominate raw-radiance variance at this tiny budget
    lo_t = np.asarray(an.tonemap(jnp.asarray(lo)))
    hi_t = np.asarray(an.tonemap(jnp.asarray(hi)))
    np.testing.assert_allclose(lo_t.mean(), hi_t.mean(), rtol=0.1)


def test_cli_analytic(tmp_path):
    """`cli analytic` renders the standalone scene end to end."""
    import os
    import subprocess
    import sys

    out = tmp_path / "analytic_cli.png"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    res = subprocess.run(
        [
            sys.executable, "-m", "pyrenderer_tpu.render.cli", "analytic",
            "--cpu", "--res", "16", "16", "--spp", "1", "--depth", "2",
            "--out", str(out),
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    assert out.exists()
    import imageio.v3 as iio

    img = iio.imread(out)
    assert img.shape == (16, 16, 3)
    assert img.max() > 0
