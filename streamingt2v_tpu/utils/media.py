"""Media I/O — the farancia `IImage` replacement.

Rebuild of the reference's media container and converters
(lib/farancia/libimage/iimage.py:42-511) as plain functions over uint8
numpy video arrays (F, H, W, C), plus mp4 export (the reference renders
through matplotlib FuncAnimation + ffmpeg, animation.py:21-37; here
OpenCV's VideoWriter writes directly).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# range conversion (utils/result_processor.py:4-14)
# ---------------------------------------------------------------------------

def convert_range(video: np.ndarray, input_range: Tuple[float, float],
                  output_range: Tuple[float, float]) -> np.ndarray:
    i0, i1 = input_range
    o0, o1 = output_range
    out = (video.astype(np.float32) - i0) / (i1 - i0) * (o1 - o0) + o0
    return out


def to_uint8(video: np.ndarray, input_range=(-1.0, 1.0)) -> np.ndarray:
    out = convert_range(video, input_range, (0.0, 255.0))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def concat_chunks(chunks: Sequence[np.ndarray]) -> np.ndarray:
    """Temporal concatenation (IImage `&`, result_processor.py:17-30)."""
    return np.concatenate(list(chunks), axis=0)


# ---------------------------------------------------------------------------
# device <-> host video movement.  The tunneled TPU platform moves data at
# ~25-40 MB/s with a pathological slow path for single buffers >~0.5 GB —
# so video crosses the link as uint8 (4x fewer bytes than f32) in bounded
# frame chunks, with range conversion running ON DEVICE.
# ---------------------------------------------------------------------------

def fetch_uint8(video, input_range=(-1.0, 1.0), frames_per_fetch: int = 32) -> np.ndarray:
    """Device float video (F, H, W, C) -> host uint8, converting on device
    and reading back in chunks.  Matches `to_uint8` bit-for-bit (same
    round-half-to-even then clip)."""
    import jax
    import jax.numpy as jnp

    i0, i1 = input_range

    @jax.jit
    def conv(x):
        # op order mirrors convert_range exactly so the result is bitwise
        # identical to to_uint8 on the same floats
        out = (x.astype(jnp.float32) - i0) / (i1 - i0) * 255.0
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    parts = []
    for i in range(0, video.shape[0], frames_per_fetch):
        parts.append(np.asarray(conv(video[i:i + frames_per_fetch])))
    return np.concatenate(parts, axis=0)


def put_unit_range(video_u8: np.ndarray, frames_per_put: int = 32):
    """Host uint8 video -> device float32 [0, 1] (chunked uint8 upload,
    on-device conversion; identical values to `video/255.0`)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def conv(x):
        return x.astype(jnp.float32) / 255.0

    parts = []
    for i in range(0, video_u8.shape[0], frames_per_put):
        parts.append(conv(jnp.asarray(video_u8[i:i + frames_per_put])))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# image loading / resizing (inference_utils.py:37-57, streaming_svd.py:383-385)
# ---------------------------------------------------------------------------

def load_image(path: str) -> np.ndarray:
    """-> (H, W, 3) uint8 RGB."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img)


def resize_to_stage1(img: np.ndarray, height: int = 576, width: int = 1024) -> np.ndarray:
    """Resize keeping aspect to `height`, center-crop/pad to `width`
    (the reference asserts 16:9 inputs and resizes to 1024x576)."""
    from PIL import Image

    pil = Image.fromarray(img)
    scale = height / pil.size[1]
    wsize = int(round(pil.size[0] * scale))
    pil = pil.resize((wsize, height), Image.BICUBIC)
    arr = np.asarray(pil)
    if wsize > width:
        x0 = (wsize - width) // 2
        arr = arr[:, x0 : x0 + width]
    elif wsize < width:
        pad = width - wsize
        arr = np.pad(arr, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)), mode="edge")
    return arr


def to_model_range(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 [-1, 1]."""
    return img.astype(np.float32) / 127.5 - 1.0


def resize_video(video: np.ndarray, height: int, width: int) -> np.ndarray:
    """Per-frame bilinear resize of a uint8/float video."""
    import cv2

    out = np.stack([
        cv2.resize(frame, (width, height), interpolation=cv2.INTER_LINEAR)
        for frame in video
    ])
    return out


# ---------------------------------------------------------------------------
# farancia IImage geometry ops (iimage.py:42-511 — the subset the pipeline
# and its users exercise: pad / crop / stack / grid)
# ---------------------------------------------------------------------------

def _as_video(x: np.ndarray) -> np.ndarray:
    """Accept (H, W, C) images or (F, H, W, C) videos; return 4D."""
    return x[None] if x.ndim == 3 else x


def pad(video: np.ndarray, top: int = 0, bottom: int = 0, left: int = 0,
        right: int = 0, mode: str = "constant", value: int = 0) -> np.ndarray:
    """Spatial padding (IImage.pad).  mode: numpy pad mode ('constant',
    'edge', 'reflect')."""
    v = _as_video(video)
    widths = ((0, 0), (top, bottom), (left, right), (0, 0))
    if mode == "constant":
        out = np.pad(v, widths, mode="constant", constant_values=value)
    else:
        out = np.pad(v, widths, mode=mode)
    return out if video.ndim == 4 else out[0]


def crop(video: np.ndarray, x0: int, y0: int, width: int, height: int) -> np.ndarray:
    """Spatial crop (IImage.crop): box given as left, top, width, height."""
    v = _as_video(video)
    out = v[:, y0 : y0 + height, x0 : x0 + width]
    return out if video.ndim == 4 else out[0]


def hstack(items: Sequence[np.ndarray]) -> np.ndarray:
    """Side-by-side concat (IImage `|`); heights must match."""
    vs = [_as_video(v) for v in items]
    return np.concatenate(vs, axis=2)


def vstack(items: Sequence[np.ndarray]) -> np.ndarray:
    """Top-to-bottom concat (IImage `__truediv__`); widths must match."""
    vs = [_as_video(v) for v in items]
    return np.concatenate(vs, axis=1)


def grid(items: Sequence[np.ndarray], cols: int) -> np.ndarray:
    """Tile images/videos into a grid (IImage.grid), row-major; the list is
    padded with black tiles to fill the last row."""
    vs = [_as_video(v) for v in items]
    shape = vs[0].shape
    assert all(v.shape == shape for v in vs), [v.shape for v in vs]
    rows = -(-len(vs) // cols)
    vs = vs + [np.zeros(shape, vs[0].dtype)] * (rows * cols - len(vs))
    return vstack([hstack(vs[r * cols : (r + 1) * cols]) for r in range(rows)])


# ---------------------------------------------------------------------------
# mp4 / y4m export
# ---------------------------------------------------------------------------

def save_video(path: str, video: np.ndarray, fps: int = 24) -> str:
    """video: (F, H, W, 3) uint8 RGB.

    .mp4 -> OpenCV VideoWriter (mp4v); .y4m -> the native async media
    feeder when built (zero-copy, encode overlaps compute), else a plain
    Python Y4M writer.
    """
    assert video.dtype == np.uint8 and video.ndim == 4 and video.shape[-1] == 3, (
        video.dtype, video.shape
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if path.endswith(".y4m"):
        return _save_y4m(path, video, fps)

    import cv2

    f, h, w, _ = video.shape
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cannot open video writer for {path}")
    for frame in video:
        writer.write(frame[:, :, ::-1])  # RGB -> BGR
    writer.release()
    return path


def _save_y4m(path: str, video: np.ndarray, fps: int) -> str:
    from streamingt2v_tpu import native

    f, h, w, _ = video.shape
    if native.available():
        with native.AsyncVideoWriter(path, w, h, fps=fps) as writer:
            writer.write(video)
        return path
    # pure-Python fallback: BT.601 RGB->YUV420 planar, matching the native
    # feeder's C420jpeg output (media_feeder.cpp:110)
    with open(path, "wb") as fh:
        fh.write(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode())
        rgb = video.astype(np.float32)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        for i in range(f):
            fh.write(b"FRAME\n")
            fh.write(np.clip(np.round(yy[i]), 0, 255).astype(np.uint8).tobytes())
            for plane in (u[i], v[i]):
                sub = plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
                fh.write(np.clip(np.round(sub), 0, 255).astype(np.uint8).tobytes())
    return path


def video_fps(path: str) -> float:
    """fps metadata of a saved container (mp4 via OpenCV; y4m via header)."""
    if path.endswith(".y4m"):
        with open(path, "rb") as fh:
            header = fh.readline().decode()
        for tok in header.split():
            if tok.startswith("F"):
                num, den = tok[1:].split(":")
                return float(num) / float(den)
        raise ValueError(f"no fps token in y4m header: {header!r}")
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return float(fps)


def load_video(path: str) -> np.ndarray:
    import cv2

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])
    cap.release()
    return np.stack(frames)
