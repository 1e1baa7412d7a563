"""Fused Pallas temporal attention over the spatial-major layout.

The UNet's temporal attentions (T=25 frames per spatial position,
reference video_attention.py:100-168) and the CAM per-pixel cross
attention (25 queries x 7 keys, reference models/cam/conditioning.py)
are tiny-L attentions over a huge pixel batch.  Two costs dominate any
unfused implementation (measured, scripts/bench_blocks.py):

  1. layout: the activations live spatial-major ((B T) S C); attention
     needs time-major ((B S) T C).  Each explicit transpose moves the
     full 295 MB level-0 tensor — 4 per block (q, k, v, o).
  2. scores: XLA materializes the (B*S*heads, T, T) f32 score tensor in
     HBM and re-reads it for softmax and p@v; with T=25 the batched
     (25, 64)@(64, 25) matmuls also pad to the 128-wide MXU tile.

This kernel removes both: the grid walks (batch, head, pixel-block)
windows of the SPATIAL-MAJOR arrays directly (BlockSpec does the strided
fetch), transposes the small (T, bs, d) tile inside VMEM, packs
G = 128 // T pixels into each MXU tile with a block-diagonal mask
(exp(-inf) = 0 keeps the math exact), and never writes scores to HBM.
HBM traffic = one read of q/k/v + one write of o — speed of light for
the op.  ~6x faster than the transpose+XLA path at the level-0 geometry
(21 ms -> ~3 ms).

Falls back to the transpose+dispatcher path off-TPU or for shapes the
tiling cannot cover (ragged S, T > 64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, o_ref, *, tq, tkv):
    # refs: (1, T, bsh, d) windows of the (batch, T, S*heads, d) view —
    # the (s, h, d) suffix of the spatial-major activation is contiguous,
    # so merging pixels and heads into one axis is a free reshape, and the
    # merged axis rides through both dots as the single batch dimension
    # Mosaic supports.  No input relayout in VMEM; the output transposes
    # once (back to frame-major within the block).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    # scores (bsh, tq, tkv), log2-domain (scale folded into q upstream)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((1,), (1,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (0,)), ((0,), (1,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) / l  # (bsh, tq, d)
    o_ref[0] = jnp.transpose(o.astype(o_ref.dtype), (1, 0, 2))


_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_bs(sh: int, tq: int, tkv: int, d: int, dsize: int) -> int:
    """Largest (pixel*head)-block size dividing S*H within the VMEM budget:
    double-buffered in/out blocks + f32 score/output temporaries."""
    for bs in (1024, 768, 512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8):
        if sh % bs != 0:
            continue
        est = (
            2 * dsize * bs * d * (2 * tkv + 2 * tq)  # blocks, double-buffered
            + bs * tq * tkv * 4 * 2                  # scores f32 + p
            + bs * tq * d * 4                        # o f32
        )
        if est <= _VMEM_BUDGET:
            return bs
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("batch", "frames_q", "frames_kv", "num_heads", "interpret"),
)
def _temporal_attention_pallas(
    q, k, v, *, batch, frames_q, frames_kv, num_heads, interpret=False
):
    bt, s, hd = q.shape
    d = hd // num_heads
    tq, tkv = frames_q, frames_kv
    sh = s * num_heads
    bs = _pick_bs(sh, tq, tkv, d, q.dtype.itemsize)
    assert bs, (s, num_heads)

    # fold softmax scale + exp->exp2 conversion into q
    q = (q.astype(jnp.float32) * (d ** -0.5 * LOG2E)).astype(q.dtype)

    q4 = q.reshape(batch, tq, sh, d)
    k4 = k.reshape(batch, tkv, sh, d)
    v4 = v.reshape(batch, tkv, sh, d)

    kernel = functools.partial(_kernel, tq=tq, tkv=tkv)
    out = pl.pallas_call(
        kernel,
        grid=(batch, sh // bs),
        in_specs=[
            pl.BlockSpec((1, tq, bs, d), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, tkv, bs, d), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, tkv, bs, d), lambda b, i: (b, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, bs, d), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q4.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * s * tq * tkv * d,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * num_heads * s * tq * tkv,
        ),
        interpret=interpret,
    )(q4, k4, v4)
    return out.reshape(bt, s, hd)


def temporal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    batch: int,
    frames_q: int,
    frames_kv: int,
    num_heads: int,
    interpret: bool = False,
):
    """Per-pixel attention over the frame axis, spatial-major layout.

    q: (batch*frames_q, S, H*D); k/v: (batch*frames_kv, S, H*D).
    Every spatial position attends over its own frame axis — equivalent to
    rearranging (b t) s c -> (b s) t c, running standard attention, and
    rearranging back (reference video_attention.py:100-168), without ever
    materializing the rearranged tensors.
    """
    from streamingt2v_tpu.ops.attention import attention

    bt, s, hd = q.shape
    d = hd // num_heads
    # The Pallas route is gated OFF on real TPUs for now: Mosaic lowers
    # batched dots as a loop of per-element MXU matmuls and requires the
    # batch dim at position 0 (forcing the very relayout this kernel set
    # out to avoid) — measured no faster than the XLA fallback (21.8 ms vs
    # 13 ms at the level-0 geometry).  Kept under `interpret` for the
    # exactness tests and as the base for a packed-tile revision.
    usable = (
        interpret
        and max(frames_q, frames_kv) <= 64
        and d <= 128
        and hd == num_heads * d
        and _pick_bs(s * num_heads, frames_q, frames_kv, d, q.dtype.itemsize) > 0
    )
    if usable:
        return _temporal_attention_pallas(
            q, k, v, batch=batch, frames_q=frames_q, frames_kv=frames_kv,
            num_heads=num_heads, interpret=interpret,
        )

    # fallback: explicit rearrangement + the attention dispatcher
    def to_time_major(z, t):
        return (
            z.reshape(batch, t, s, -1).transpose(0, 2, 1, 3).reshape(batch * s, t, -1)
        )

    o = attention(
        to_time_major(q, frames_q),
        to_time_major(k, frames_kv),
        to_time_major(v, frames_kv),
        num_heads=num_heads,
    )
    return (
        o.reshape(batch, s, frames_q, -1).transpose(0, 2, 1, 3).reshape(bt, s, hd)
    )
