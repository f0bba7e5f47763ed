"""Driver/CLI/film/tonemap tests: progressive accumulation, checkpoint/resume."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core.film import Film
from pyrenderer_tpu.core.integrator import render_image
from pyrenderer_tpu.core.tonemap import tonemap
from pyrenderer_tpu.render.driver import ProgressiveRenderer
from pyrenderer_tpu.scene import load_tungsten


def test_progressive_matches_batch(cornell_path):
    """Accumulating 1-sample passes must equal the one-shot spp render."""
    scene, camera, _ = load_tungsten(cornell_path)
    cfg = RenderConfig(max_bounces=3, spp=4, spp_step=1, seed=2, resolution=(16, 16))
    r = ProgressiveRenderer(scene, camera, cfg)
    film = r.run(quiet=True)
    assert film.spp == 4
    import jax

    batch = np.asarray(
        render_image(
            jax.tree.map(jnp.asarray, scene),
            camera._replace(resolution=(16, 16)),
            cfg,
        )
    )
    np.testing.assert_allclose(film.hdr, batch, rtol=2e-5, atol=1e-6)


def test_checkpoint_resume(cornell_path, tmp_path):
    """Interrupt at 2 spp, resume to 4 — identical to an uninterrupted run."""
    scene, camera, _ = load_tungsten(cornell_path)
    cfg4 = RenderConfig(max_bounces=3, spp=4, spp_step=1, seed=2, resolution=(12, 12),
                        checkpoint_interval=1)
    ckpt = str(tmp_path / "film.npz")

    half = ProgressiveRenderer(scene, camera, cfg4.replace(spp=2))
    half.run(checkpoint_path=ckpt, quiet=True)
    film = Film.load(ckpt)
    assert film.spp == 2

    resumed = ProgressiveRenderer(scene, camera, cfg4, film=film)
    resumed.run(quiet=True)
    full = ProgressiveRenderer(scene, camera, cfg4)
    full.run(quiet=True)
    np.testing.assert_allclose(resumed.film.hdr, full.film.hdr, rtol=1e-6)


def test_resume_seed_mismatch_rejected(cornell_path):
    scene, camera, _ = load_tungsten(cornell_path)
    cfg = RenderConfig(spp=2, seed=2, resolution=(8, 8))
    film = Film.blank(8, 8, seed=99)
    with pytest.raises(ValueError, match="seed"):
        ProgressiveRenderer(scene, camera, cfg, film=film)


def test_tonemap_modes():
    hdr = jnp.asarray(np.random.RandomState(0).uniform(0, 4, (8, 8, 3)))
    s = np.asarray(tonemap(hdr, "sqrt"))
    r = np.asarray(tonemap(hdr, "reinhard"))
    assert s.min() >= 0 and s.max() <= 1
    assert r.min() >= 0 and r.max() <= 1
    # reinhard scales each pixel's rgb by one luminance factor: hue ratios
    # survive wherever nothing clipped
    unclipped = (r < 1.0).all(-1) & (np.asarray(hdr) > 1e-3).all(-1)
    ratio_in = np.asarray(hdr)[unclipped][:, 0] / np.asarray(hdr)[unclipped][:, 1]
    ratio_out = r[unclipped][:, 0] / r[unclipped][:, 1]
    np.testing.assert_allclose(ratio_in, ratio_out, rtol=1e-5)
    with pytest.raises(ValueError):
        tonemap(hdr, "bogus")
    # NaNs are zeroed, not propagated (reference tone_map.py:8)
    bad = hdr.at[0, 0, 0].set(jnp.nan)
    assert np.isfinite(np.asarray(tonemap(bad, "sqrt"))).all()


def test_tonemap_filmic():
    """Hable filmic: range, strict monotonicity, 0->0, distinct from reinhard."""
    x = jnp.linspace(0.0, 16.0, 513)[:, None, None] * jnp.ones((1, 1, 3))
    f = np.asarray(tonemap(x, "filmic"))
    assert f.min() >= 0 and f.max() <= 1
    assert f[0].max() == 0.0  # maps black to black
    ramp = f[:, 0, 0]
    assert (np.diff(ramp) >= 0).all()
    assert (np.diff(ramp[ramp < 0.999]) > 0).all()  # strictly increasing pre-clip
    # a real shoulder/toe curve, not the reinhard alias of round 1
    r = np.asarray(tonemap(x, "reinhard"))
    assert np.abs(f - r).max() > 0.05
    assert np.isfinite(np.asarray(tonemap(x.at[0, 0, 0].set(jnp.nan), "filmic"))).all()


def test_preview_interval(cornell_path, tmp_path, monkeypatch):
    """--preview-interval dumps intermediate tonemapped PNGs during the run
    (reference main_taichi.py:119-125 dumped out.png every 100 passes)."""
    scene, camera, _ = load_tungsten(cornell_path)
    preview = tmp_path / "prev.png"
    cfg = RenderConfig(
        max_bounces=2, spp=3, spp_step=1, seed=1, resolution=(8, 8),
        preview_interval=1, preview_file=str(preview),
    )
    seen = []
    r = ProgressiveRenderer(
        scene, camera, cfg,
        on_pass=lambda rr: seen.append(preview.exists()),
    )
    r.run(quiet=True)
    assert preview.exists()
    import imageio.v3 as iio

    img = iio.imread(preview)
    assert img.shape == (8, 8, 3)


def test_adaptive_sampling(cornell_path):
    """Adaptive refinement: noisy pixels get extra samples, converged ones
    stop at min spp; final image stays unbiased vs a high-spp baseline."""
    scene, camera, _ = load_tungsten(cornell_path)
    cfg = RenderConfig(
        max_bounces=3, spp=12, spp_step=1, seed=4, resolution=(24, 24),
        adaptive=True, adaptive_min_spp=4, adaptive_tolerance=0.05,
    )
    r = ProgressiveRenderer(scene, camera, cfg)
    film = r.run(quiet=True)
    spp = film.spp_map
    assert spp.min() >= 4
    assert spp.max() <= 12
    assert spp.max() > spp.min()  # some pixels actually got refined
    # unconverged-or-capped everywhere: err <= tol or spp at cap
    err = film.relative_error()
    assert np.all((err <= cfg.adaptive_tolerance) | (spp >= cfg.spp))
    # against a flat high-spp render, the adaptive image is consistent
    flat = ProgressiveRenderer(scene, camera, cfg.replace(adaptive=False, spp=48, seed=4))
    flat.run(quiet=True)
    diff = np.abs(film.hdr - flat.film.hdr).mean()
    assert diff < 0.05


def test_cli_end_to_end(cornell_path, tmp_path):
    out = tmp_path / "cli_out.png"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    res = subprocess.run(
        [
            sys.executable, "-m", "pyrenderer_tpu.render.cli", cornell_path,
            "--cpu", "--res", "16", "16", "--spp", "2", "--depth", "2",
            "--out", str(out), "--quiet",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    assert out.exists()
    import imageio.v3 as iio

    img = iio.imread(out)
    assert img.shape == (16, 16, 3)
    assert img.max() > 0


def test_run_resilient_recovers_and_matches_uninterrupted(cornell_path):
    """Transient pass failures: run_resilient retries from the exact pass
    (host-side accumulation + counter RNG) and the final film is
    bit-identical to an uninterrupted render."""
    import time as _time
    from pyrenderer_tpu.scene import load_tungsten
    from pyrenderer_tpu.render.driver import ProgressiveRenderer

    scene, camera, cfg = load_tungsten(cornell_path, dtype=np.float32)
    camera = camera._replace(resolution=(12, 12))
    cfg = cfg.replace(spp=4, spp_step=1, max_bounces=2, seed=7)

    clean = ProgressiveRenderer(scene, camera, cfg)
    clean.run(quiet=True)

    flaky = ProgressiveRenderer(scene, camera, cfg)
    orig = flaky.render_one_pass
    calls = {"n": 0}

    def sometimes_fails():
        calls["n"] += 1
        if calls["n"] in (1, 3):
            raise RuntimeError("injected transient device failure")
        return orig()

    flaky.render_one_pass = sometimes_fails
    t0 = _time.time()
    film = flaky.run_resilient(max_retries=3, backoff=0.01, quiet=True)
    assert _time.time() - t0 < 60
    assert film.spp == cfg.spp
    np.testing.assert_array_equal(film.hdr, clean.film.hdr)
    np.testing.assert_array_equal(film.spp_map, clean.film.spp_map)


def test_run_resilient_gives_up_after_max_retries(cornell_path):
    from pyrenderer_tpu.scene import load_tungsten
    from pyrenderer_tpu.render.driver import ProgressiveRenderer

    scene, camera, cfg = load_tungsten(cornell_path, dtype=np.float32)
    camera = camera._replace(resolution=(8, 8))
    cfg = cfg.replace(spp=2, spp_step=1, max_bounces=2)
    r = ProgressiveRenderer(scene, camera, cfg)

    def always_fails():
        raise RuntimeError("hard failure")

    r.render_one_pass = always_fails
    with pytest.raises(RuntimeError, match="hard failure"):
        r.run_resilient(max_retries=2, backoff=0.01, quiet=True)


def test_run_resilient_rejects_nonfinite_pass(cornell_path):
    """A pass producing NaN radiance is detected BEFORE the film absorbs
    it; a transient NaN is retried and the final accumulation is clean."""
    from pyrenderer_tpu.render import driver as drv
    from pyrenderer_tpu.scene import load_tungsten
    from pyrenderer_tpu.render.driver import ProgressiveRenderer

    scene, camera, cfg = load_tungsten(cornell_path, dtype=np.float32)
    camera = camera._replace(resolution=(8, 8))
    cfg = cfg.replace(spp=2, spp_step=1, max_bounces=2, seed=3)

    clean = ProgressiveRenderer(scene, camera, cfg)
    clean.run(quiet=True)

    r = ProgressiveRenderer(scene, camera, cfg)
    orig_pass = drv._render_pass
    calls = {"n": 0}

    def poisoned(*a, **k):
        s, q = orig_pass(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            s = s.at[0].set(jnp.nan)
        return s, q

    r.render_one_pass.__func__  # noqa: B018 — sanity the method exists
    import unittest.mock as mock
    with mock.patch.object(drv, "_render_pass", poisoned):
        film = r.run_resilient(max_retries=2, backoff=0.01, quiet=True)
    assert np.isfinite(film.hdr).all()
    assert film.spp == cfg.spp
    np.testing.assert_array_equal(film.hdr, clean.film.hdr)


def test_termview_ansi_frame():
    """Half-block live view: correct escape structure, in-place redraw."""
    import io
    from pyrenderer_tpu.utils.termview import LiveView, frame_to_ansi

    img = np.zeros((8, 6, 3), np.float32)
    img[:4] = [1.0, 0.0, 0.0]          # top half red
    img[4:] = [0.0, 0.0, 1.0]          # bottom half blue
    art = frame_to_ansi(img, max_cols=6, max_rows=4)
    lines = art.split("\n")
    assert len(lines) == 4              # 8 pixel rows -> 4 half-block rows
    assert "\x1b[38;2;255;0;0m" in lines[0]      # red foreground on top
    assert "\x1b[48;2;0;0;255m" in lines[2]      # blue background below
    assert all(line.endswith("\x1b[0m") for line in lines)

    buf = io.StringIO()
    v = LiveView(max_cols=6, max_rows=4, stream=buf)
    v.update(img, "1/2 spp")
    v.update(img, "2/2 spp")
    out = buf.getvalue()
    assert "1/2 spp" in out and "2/2 spp" in out
    assert "\x1b[5F\x1b[J" in out       # second frame rewinds 4 art + 1 status lines


def test_cli_live_smoke(cornell_path, capsys):
    """--live end-to-end through the CLI main (non-tty stream)."""
    import os
    import tempfile
    from pyrenderer_tpu.render.cli import main

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "live.png")
        rc = main([
            cornell_path, "--cpu", "--res", "16", "16", "--spp", "2",
            "--depth", "2", "--live", "--out", out, "--quiet",
        ])
        assert rc == 0
        assert os.path.exists(out)
        err = capsys.readouterr().err
        assert "▀" in err and "2/2 spp" in err


def test_cli_tonemap_mode(cornell_path, tmp_path):
    """Offline tonemapper through the CLI (the reference's tone_map.py
    role): render -> save EXR -> tonemap to PNG via a separate invocation."""
    from pyrenderer_tpu.render.cli import main
    from pyrenderer_tpu.utils.exr import write_exr

    hdr = np.abs(np.random.RandomState(0).standard_normal((12, 10, 3))).astype(np.float32)
    exr = str(tmp_path / "x.exr")
    write_exr(exr, hdr)
    out = str(tmp_path / "x.png")
    rc = main(["tonemap", "--input", exr, "--tonemap", "filmic", "--out", out])
    assert rc == 0 and os.path.exists(out)
    import imageio.v3 as iio

    img = iio.imread(out)
    assert img.shape == (12, 10, 3)
    # .npy input path too
    npy = str(tmp_path / "y.npy")
    np.save(npy, hdr)
    rc = main(["tonemap", "--input", npy, "--out", str(tmp_path / "y.png")])
    assert rc == 0 and os.path.exists(str(tmp_path / "y.png"))
    # missing --input is a clean usage error
    assert main(["tonemap"]) == 2


def test_cli_debug_paths(tmp_path, cornell_path):
    """`--debug-paths` writes the self-contained HTML viewer + PLY instead
    of rendering (the reference's main.py -d open3d mode, headless)."""
    import subprocess
    import sys

    out = tmp_path / "paths.html"
    r = subprocess.run(
        [sys.executable, "-m", "pyrenderer_tpu.render.cli",
         str(cornell_path), "--cpu", "--debug-paths", str(out),
         "--res", "32", "32", "--depth", "3", "--debug-rays", "9"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    html = out.read_text()
    assert "const DATA" in html and "http" not in html.split("DOCTYPE")[1][:50]
    assert (tmp_path / "paths.ply").read_text().startswith("ply")
