"""Attention dispatcher.

One entry point for every attention geometry in the pipeline (SURVEY.md
§2.8): spatial self-attention (9216 tokens at the 72x128 latent), temporal
attention (25 frames x huge batch), CLIP-token cross-attention (kv_len ~1),
CAM per-pixel cross-attention (F x 7), and the single-head 512-dim VAE
bottleneck attention.

Large geometries route to the Pallas flash kernel on TPU; small ones to a
plain XLA batched-matmul path (two MXU matmuls + fused softmax) which XLA
handles at speed-of-light without a custom kernel.  fp32 softmax always.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from streamingt2v_tpu.ops.flash_attention import flash_attention

# Below this many score-matrix elements per (batch*head), materializing
# the (Lq, Lk) scores is cheaper than a kernel launch.
_FLASH_MIN_SCORE_ELEMS = 2048 * 2048

# Global override for experiments/benchmarks: "flash" | "xla" | "" (auto)
_FORCED_BACKEND = os.environ.get("STREAMINGT2V_ATTN_BACKEND", "")


def dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """Reference XLA attention. q: (..., Lq, D), k/v: (..., Lk, D)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("...qd,...kd->...qk", q, v.dtype.type(scale) * k.astype(v.dtype)).astype(
        jnp.float32
    )
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p.astype(v.dtype), v)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int = 1,
    backend: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention over flat (B, L, H*D) tensors.

    Splits heads, dispatches to flash/XLA, and re-merges.  `backend` forces
    'flash' or 'xla'; default auto-selects by geometry and platform.
    """
    b, lq, hd = q.shape
    _, lk, _ = k.shape
    d = hd // num_heads
    assert num_heads * d == hd, (num_heads, hd)

    qh = q.reshape(b, lq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, d).transpose(0, 2, 1, 3)

    if backend is None and _FORCED_BACKEND:
        backend = _FORCED_BACKEND
    if backend is None:
        use_flash = _on_tpu() and lq * lk >= _FLASH_MIN_SCORE_ELEMS
    else:
        use_flash = backend == "flash"

    if use_flash:
        o = flash_attention(
            qh.reshape(b * num_heads, lq, d),
            kh.reshape(b * num_heads, lk, d),
            vh.reshape(b * num_heads, lk, d),
        ).reshape(b, num_heads, lq, d)
    else:
        o = dot_product_attention(qh, kh, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, hd)
