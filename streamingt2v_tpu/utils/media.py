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
# mp4 export
# ---------------------------------------------------------------------------

def save_video(path: str, video: np.ndarray, fps: int = 24) -> str:
    """video: (F, H, W, 3) uint8 RGB -> mp4 (OpenCV, mp4v codec)."""
    import cv2

    assert video.dtype == np.uint8 and video.ndim == 4 and video.shape[-1] == 3, (
        video.dtype, video.shape
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    f, h, w, _ = video.shape
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cannot open video writer for {path}")
    for frame in video:
        writer.write(frame[:, :, ::-1])  # RGB -> BGR
    writer.release()
    return path


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
