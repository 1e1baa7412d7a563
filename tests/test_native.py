"""Native media feeder: build, async semantics, and Y4M golden parse."""

import os

import numpy as np
import pytest

from streamingt2v_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _parse_y4m(path):
    with open(path, "rb") as f:
        data = f.read()
    header, rest = data.split(b"\n", 1)
    fields = dict(
        (kv[0:1].decode(), kv[1:].decode()) for kv in header.split(b" ")[1:]
    )
    w, h = int(fields["W"]), int(fields["H"])
    frame_size = w * h + 2 * (w // 2) * (h // 2)
    frames = []
    while rest:
        assert rest.startswith(b"FRAME\n")
        rest = rest[6:]
        frames.append(np.frombuffer(rest[:frame_size], np.uint8))
        rest = rest[frame_size:]
    return w, h, frames


def test_async_writer_roundtrip(tmp_path):
    path = str(tmp_path / "out.y4m")
    frames = np.zeros((4, 16, 32, 3), np.float32)
    frames[0] = 1.0   # white frame
    frames[1] = -1.0  # black frame
    frames[2, :, :, 0] = 1.0  # red
    frames[2, :, :, 1:] = -1.0
    with native.AsyncVideoWriter(path, 32, 16, fps=8) as w:
        w.write(frames)
    wdt, hgt, parsed = _parse_y4m(path)
    assert (wdt, hgt) == (32, 16) and len(parsed) == 4
    y0 = parsed[0][: 32 * 16]
    y1 = parsed[1][: 32 * 16]
    # BT.601 limited range: white ~235, black ~16
    assert abs(int(y0[0]) - 235) <= 1 and abs(int(y1[0]) - 16) <= 1
    # red frame: V (cr) high
    v2 = parsed[2][32 * 16 + 8 * 16:]
    assert int(v2[0]) > 200


def test_async_writer_overlaps(tmp_path):
    """Submit returns before encoding completes (async), close() drains."""
    path = str(tmp_path / "big.y4m")
    frames = np.random.RandomState(0).rand(64, 64, 64, 3).astype(np.float32) * 2 - 1
    w = native.AsyncVideoWriter(path, 64, 64)
    w.write(frames)
    # can't guarantee timing, but pending must be tracked and drain to 0
    assert w.pending >= 0
    w.close()
    _, _, parsed = _parse_y4m(path)
    assert len(parsed) == 64


def test_writer_rejects_odd_dims(tmp_path):
    with pytest.raises(RuntimeError):
        native.AsyncVideoWriter(str(tmp_path / "x.y4m"), 33, 16)
