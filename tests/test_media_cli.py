"""Media utils + CLI smoke test (tiny config, stage 1 only, real mp4 out)."""

import os

import numpy as np
import pytest

from streamingt2v_tpu.utils import media


pytestmark = pytest.mark.slow


def test_convert_range_and_uint8():
    v = np.asarray([[-1.0, 0.0, 1.0]])
    out = media.to_uint8(v[..., None, None].transpose(0, 2, 3, 1))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out.ravel(), [0, 128, 255])


def test_concat_chunks():
    a = np.zeros((2, 4, 4, 3), np.uint8)
    b = np.ones((3, 4, 4, 3), np.uint8)
    out = media.concat_chunks([a, b])
    assert out.shape == (5, 4, 4, 3)


def test_resize_to_stage1_aspect():
    img = np.zeros((720, 1280, 3), np.uint8)  # 16:9
    out = media.resize_to_stage1(img, 576, 1024)
    assert out.shape == (576, 1024, 3)
    # non-16:9 gets center-cropped
    img2 = np.zeros((720, 1500, 3), np.uint8)
    assert media.resize_to_stage1(img2, 576, 1024).shape == (576, 1024, 3)


def test_save_and_load_video(tmp_path):
    video = np.random.RandomState(0).randint(0, 255, (6, 64, 64, 3), np.uint8)
    path = media.save_video(str(tmp_path / "out.mp4"), video, fps=8)
    assert os.path.getsize(path) > 0
    back = media.load_video(path)
    assert back.shape == video.shape


def test_cli_tiny_stage1_end_to_end(tmp_path):
    """The fast_dev_run done properly: tiny random-weight pipeline from the
    CLI surface writes a playable mp4."""
    from PIL import Image

    from streamingt2v_tpu.pipeline.cli import main

    img = (np.random.RandomState(0).rand(90, 160, 3) * 255).astype(np.uint8)
    in_path = str(tmp_path / "input.png")
    Image.fromarray(img).save(in_path)
    out_dir = str(tmp_path / "results")
    rc = main([
        "--input", in_path, "--output", out_dir, "--tiny",
        "--num_frames", "8", "--out_fps", "8",
    ])
    assert rc == 0
    out_path = os.path.join(out_dir, "input.mp4")
    assert os.path.exists(out_path)
    video = media.load_video(out_path)
    assert video.shape[0] == 4  # stage-1 only: (8+1)//2


def test_farancia_geometry_ops():
    """pad/crop/stack/grid parity with farancia IImage semantics
    (reference lib/farancia/libimage/iimage.py:42-511)."""
    from streamingt2v_tpu.utils import media

    img = np.arange(2 * 3, dtype=np.uint8).reshape(2, 3)[..., None].repeat(3, -1)
    vid = np.stack([img, img + 1])

    p = media.pad(img, top=1, left=2, value=7)
    assert p.shape == (3, 5, 3) and (p[0] == 7).all() and (p[:1, :2] == 7).all()
    np.testing.assert_array_equal(p[1:, 2:], img)

    c = media.crop(vid, x0=1, y0=0, width=2, height=2)
    assert c.shape == (2, 2, 2, 3)
    np.testing.assert_array_equal(c[0], img[:2, 1:3])

    h = media.hstack([img, img])
    assert h.shape == (1, 2, 6, 3)
    v = media.vstack([vid, vid])
    assert v.shape == (2, 4, 3, 3)

    g = media.grid([img, img, img], cols=2)  # pads to 2x2 with a black tile
    assert g.shape == (1, 4, 6, 3)
    assert (g[0, 2:, 3:] == 0).all()


def test_save_video_fps_metadata(tmp_path):
    """The exported containers carry the requested fps (mp4 via OpenCV
    metadata; y4m via header) and the right frame count."""
    from streamingt2v_tpu.utils import media

    video = np.random.RandomState(0).randint(0, 255, (6, 32, 64, 3), np.uint8)
    mp4 = str(tmp_path / "out.mp4")
    media.save_video(mp4, video, fps=24)
    assert abs(media.video_fps(mp4) - 24.0) < 0.01
    assert media.load_video(mp4).shape == video.shape

    y4m = str(tmp_path / "out.y4m")
    media.save_video(y4m, video, fps=16)
    assert media.video_fps(y4m) == 16.0
    # frame count: parse the stream
    data = open(y4m, "rb").read()
    assert data.count(b"FRAME\n") == 6
