"""Pallas TPU flash attention (blockwise online-softmax).

TPU-native replacement for the reference's attention kernels:
xformers `memory_efficient_attention` (reference
models/svd/sgm/modules/attention.py:424-446) and torch SDPA (:339-343).
Instead of the reference's 32768-row batch-splitting workaround
(:424-442), K/V are streamed block-by-block through VMEM with the
softmax computed online, so memory is O(block) regardless of sequence
length.

Layout: q (B, Lq, D), k/v (B, Lk, D) where B already folds batch x heads.
The grid is (B, Lq/bq, Lk/bk); the k-axis is innermost so the running
max / denominator / accumulator scratch persists across k blocks
(TPU grids execute sequentially).  fp32 accumulation throughout; inputs
may be bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, kv_len, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Matmuls take the native (bf16) inputs — casting to f32 first would
    # run the MXU in its much slower f32 mode; accumulation is f32 via
    # preferred_element_type.  Softmax math stays f32.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    # precision pinned to DEFAULT: a global jax_default_matmul_precision of
    # "highest" would request fp32 contract precision on bf16 operands,
    # which Mosaic rejects ("Bad lhs type"); accumulation is f32 regardless.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale  # (bq, bk) f32
    if kv_len % block_k != 0:
        # only the final k block contains padding; branch so the common
        # blocks skip the per-element iota+select entirely
        def _mask(s):
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            return jnp.where(col < kv_len, s, NEG_INF)

        s = jax.lax.cond(j == nk - 1, _mask, lambda s: s, s)

    # m/l scratch are (bq, 128) with all lanes equal (full-lane broadcast
    # keeps the VPU layout aligned); slice lane 0 when a (bq, 1) is needed.
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new[:, 0:1])
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha[:, 0:1] + jnp.dot(
        p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    m_scr[:] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Softmax attention over (B, L, D) tensors, B = batch*heads."""
    assert q.ndim == 3 and k.ndim == 3 and v.ndim == 3
    b, lq, d = q.shape
    _, lk, _ = k.shape
    scale = d ** -0.5

    # Pad head dim to the 128-lane tile: zero columns leave q.k^T unchanged
    # and add zero output columns which are sliced away.
    d_pad = max(128, -(-d // 128) * 128)
    q = _pad_to(q, 2, d_pad)
    k = _pad_to(k, 2, d_pad)
    v = _pad_to(v, 2, d_pad)

    block_q = min(block_q, max(8, -(-lq // 8) * 8))
    block_k = min(block_k, max(128, -(-lk // 128) * 128))
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k

    kernel = functools.partial(_flash_kernel, scale=scale, kv_len=lk, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, qp.shape[1], d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq * lk * d_pad,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * lq * lk,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :lq, :d]
