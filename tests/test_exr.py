"""Pure-Python OpenEXR I/O (utils/exr.py + utils/exr_piz.py).

The environment ships no EXR backend, yet the reference's ground truth
is a PIZ-compressed EXR and Tungsten scenes name `.exr` HDR outputs —
so the renderer bundles its own: write (FLOAT scanline, ZIP/none), read
(none/ZIPS/ZIP/PIZ, HALF/FLOAT). PIZ decode correctness is pinned
end-to-end against the reference's independently-produced PNG of the
same render.
"""

import os

import numpy as np
import pytest

from pyrenderer_tpu.utils.exr import read_exr, write_exr

_REF_EXR = "/root/reference/media/cornell-box/TungstenRender.exr"
_REF_PNG = "/root/reference/media/cornell-box/TungstenRender.png"


@pytest.mark.parametrize("compression", ["none", "zip"])
def test_exr_roundtrip_exact(tmp_path, compression):
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((37, 23, 3)).astype(np.float32) * 10).clip(0)
    img[0, 0] = [1e-8, 1e8, 0.0]          # extremes survive FLOAT channels
    path = str(tmp_path / f"t_{compression}.exr")
    write_exr(path, img, compression)
    back = read_exr(path)
    np.testing.assert_array_equal(img, back)


def test_exr_writer_via_write_hdr(tmp_path):
    """The driver's hdr_output_file .exr path really writes EXR now (the
    old imageio fallback dropped stray .npy files instead)."""
    from pyrenderer_tpu.utils.image_io import write_hdr

    img = np.random.rand(8, 8, 3).astype(np.float32)
    path = str(tmp_path / "out.exr")
    written = write_hdr(path, img)
    assert written == path and os.path.exists(path)
    np.testing.assert_array_equal(read_exr(path), img)


def test_exr_rejects_garbage(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr at all")
    with pytest.raises(ValueError):
        read_exr(str(p))


@pytest.mark.skipif(
    not os.path.exists(_REF_EXR),
    reason="reference ground-truth EXR not mounted",
)
def test_piz_decode_matches_reference_png():
    """Decode the reference's PIZ ground truth (HALF channels, Huffman +
    wavelet) and match Tungsten's own 8-bit PNG of the same render under
    its filmic (Hejl-Dawson) curve — mean abs error at the 8-bit
    quantization level proves the whole decode chain."""
    import imageio.v3 as iio

    gt = read_exr(_REF_EXR)
    assert gt.shape == (1024, 1024, 3)
    assert np.isfinite(gt).all() and gt.min() >= 0
    png = iio.imread(_REF_PNG).astype(np.float32) / 255.0

    x = np.maximum(0.0, gt - 0.004)
    ldr = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    err = np.abs(np.clip(ldr, 0, 1) - png[:, :, :3]).mean()
    assert err < 0.004, err                 # measured 0.00174


def test_exr_rgba_channel_order(tmp_path):
    """Channels are stored alphabetically (A, B, G, R); the reader must
    hand back RGB-first regardless — an RGBA file previously came back as
    (A, B, G) in the first three slots."""
    import struct
    from pyrenderer_tpu.utils import exr as x

    h, w = 3, 5
    rng = np.random.default_rng(1)
    img = rng.standard_normal((h, w, 4)).astype(np.float32)  # RGBA semantics

    # hand-build a 4-channel EXR with alphabetical (A,B,G,R) storage
    channels = (x._chan(b"A", 2) + x._chan(b"B", 2) + x._chan(b"G", 2)
                + x._chan(b"R", 2) + b"\x00")
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b"".join([
        x._attr(b"channels", b"chlist", channels),
        x._attr(b"compression", b"compression", b"\x00"),
        x._attr(b"dataWindow", b"box2i", box),
        x._attr(b"displayWindow", b"box2i", box),
        x._attr(b"lineOrder", b"lineOrder", b"\x00"),
        x._attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
        x._attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0)),
        x._attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
        b"\x00",
    ])
    pre = struct.pack("<ii", 20000630, 2) + header
    blocks = []
    for y in range(h):
        raw = b"".join(
            np.ascontiguousarray(img[y, :, c]).tobytes() for c in (3, 2, 1, 0)
        )  # storage order A,B,G,R = img channels 3,2,1,0
        blocks.append((y, raw))
    pos = len(pre) + 8 * h
    offs = []
    for _, d in blocks:
        offs.append(pos)
        pos += 8 + len(d)
    path = str(tmp_path / "rgba.exr")
    with open(path, "wb") as fh:
        fh.write(pre)
        for o in offs:
            fh.write(struct.pack("<Q", o))
        for y, d in blocks:
            fh.write(struct.pack("<ii", y, len(d)))
            fh.write(d)

    back = read_exr(path)
    assert back.shape == (h, w, 4)
    np.testing.assert_array_equal(back[:, :, :3], img[:, :, :3])  # R,G,B
    np.testing.assert_array_equal(back[:, :, 3], img[:, :, 3])    # then A
