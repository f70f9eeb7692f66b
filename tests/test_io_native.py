"""Native frame encoder: build, write, decode-verify vs input pixels."""

import os
import struct
import zlib

import numpy as np
import pytest

from sph_tpu import io_native


pytestmark = pytest.mark.skipif(
    not io_native.available(), reason="native toolchain unavailable"
)


def _decode_png_rgb(path):
    """Minimal PNG decoder for our own filter-0 RGB8 output."""
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w, h = 8, b"", None, None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", payload[:8])
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    rows = [raw[i * stride + 1 : (i + 1) * stride] for i in range(h)]
    return np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, 3)


def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(70)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "n.png")
    assert io_native.write_png(path, rgb)
    got = _decode_png_rgb(path)
    assert np.array_equal(got, rgb)


def test_native_apng_structure(tmp_path):
    rng = np.random.default_rng(71)
    frames = rng.integers(0, 256, (5, 32, 40, 3), dtype=np.uint8)
    path = str(tmp_path / "n.apng")
    assert io_native.write_apng(path, frames, fps=10)
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"acTL" in data and b"fcTL" in data and b"fdAT" in data
    # animation control declares 5 frames
    i = data.index(b"acTL") + 4
    (n_frames,) = struct.unpack(">I", data[i : i + 4])
    assert n_frames == 5


def test_render_uses_native(tmp_path):
    from helpers import small_scene
    from sph_tpu import render
    from sph_tpu.state import init

    scene = small_scene(dim=2)
    state = init(scene)
    path = str(tmp_path / "frame.png")
    render.save_frame(state, scene, path, width=120, height=90)
    got = _decode_png_rgb(path)
    assert got.shape == (90, 120, 3)
    assert got.sum() > 0
