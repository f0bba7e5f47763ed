"""Ray-path logger tests (RayLogger-analog, SURVEY §5.5)."""

import numpy as np
import pytest

from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.debug.logger import log_paths
from pyrenderer_tpu.scene.tungsten import load_tungsten


@pytest.fixture(scope="module")
def log(cornell_path):
    scene, camera, _ = load_tungsten(cornell_path)
    camera = camera._replace(resolution=(64, 64))
    cfg = RenderConfig(max_bounces=4, seed=3)
    xs = np.array([10, 32, 50], np.int32)
    ys = np.array([32, 32, 20], np.int32)
    return log_paths(scene, camera, cfg, xs, ys)


def test_log_shapes(log):
    assert log.hit_point.shape == (4, 3, 3)
    assert log.hit.dtype == bool
    # primary rays all hit something in a closed box
    assert log.hit[0].all()
    # bounce-0 hit distances are camera->wall scale
    assert (log.t[0] > 5).all() and (log.t[0] < 12).all()


def test_segments_and_ply(log, tmp_path):
    segs = log.segments()
    assert len(segs) >= 3
    kinds = {k for _, _, k in segs}
    assert "path" in kinds
    # path segments connect: first segment starts at the camera
    a, b, _ = segs[0]
    np.testing.assert_allclose(a, [0, 1, 6.8], atol=1e-5)
    ply = tmp_path / "paths.ply"
    log.write_ply(str(ply))
    text = ply.read_text()
    assert text.startswith("ply")
    assert "element edge" in text
    npz = tmp_path / "paths.npz"
    log.save(str(npz))
    loaded = np.load(npz)
    assert "hit_point" in loaded


def test_points_inside_box(log):
    """All recorded hit points must lie in the Cornell box volume."""
    pts = log.hit_point[log.hit]
    assert (pts[:, 0] > -1.01).all() and (pts[:, 0] < 1.01).all()
    assert (pts[:, 1] > -0.01).all() and (pts[:, 1] < 2.01).all()
    assert (pts[:, 2] > -1.01).all() and (pts[:, 2] < 1.01).all()


def test_write_html_viewer(log, tmp_path, cornell_path):
    """Self-contained interactive viewer: one HTML file, valid embedded
    JSON payload, no external resources (works offline — the headless
    replacement for the reference's open3d windows)."""
    import json
    import re

    scene, _, _ = load_tungsten(cornell_path)
    out = tmp_path / "paths.html"
    log.write_html(str(out), scene=scene)
    html = out.read_text()
    assert "http://" not in html and "https://" not in html  # no CDN
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert len(data["paths"]) >= 1
    assert all(len(p) >= 2 for p in data["paths"])
    assert len(data["wire"]) > 0 and data["radius"] > 0
    # paths start at the camera
    np.testing.assert_allclose(data["paths"][0][0], [0, 1, 6.8], atol=1e-4)
