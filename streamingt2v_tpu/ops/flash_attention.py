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

Geometry handling (profile-driven, docs/PERF.md):
  - the head dim is NOT padded to 128: d=64 runs natively (the MXU runs a
    64-deep contraction at the same rate as a zero-padded 128 one, and the
    HBM pad/slice copies around the kernel cost real wall-time);
  - block sizes are chosen per-shape to minimize sequence padding (the
    fixed 1024 default padded the 2304-token level-1 geometry to 3072 on
    both axes = +78% MXU work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, kv_len, block_k):
    """The softmax scale and ln2 conversion are pre-folded into q by the
    caller (q' = q * scale * log2(e)), so the score block needs no scalar
    multiply and the softmax runs on exp2 — one fewer full VPU pass over
    the (bq, bk) block per k step each."""
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
    )  # (bq, bk) f32, already in the log2 domain
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
    p = jnp.exp2(s - m_new[:, 0:1])
    alpha = jnp.exp2(m_prev - m_new)
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


def _pick_block(length: int, maximum: int, granule: int) -> int:
    """Pick a block size <= maximum (multiple of `granule`) that minimizes
    the padded total ceil(length/b)*b; ties go to the larger block."""
    if length <= maximum:
        return -(-length // granule) * granule
    best_b, best_padded = granule, None
    for b in range(maximum, granule - 1, -granule):
        padded = -(-length // b) * b
        if best_padded is None or padded < best_padded:
            best_b, best_padded = b, padded
            if padded == length:
                break
    return best_b


def _attention_reference(q, k, v):
    """Pure-jnp f32 reference attention (the custom VJP of the Pallas
    forward — Pallas cannot differentiate the kernel; training/remat get
    ordinary XLA attention math for the backward)."""
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (d ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, block_q, block_k, interpret):
    return _flash_pallas(q, k, v, block_q, block_k, interpret)


def _flash_core_fwd(q, k, v, block_q, block_k, interpret):
    return _flash_pallas(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_core_bwd(block_q, block_k, interpret, saved, g):
    _, vjp = jax.vjp(_attention_reference, *saved)
    return vjp(g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


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
    return _flash_core(q, k, v, block_q, block_k, interpret)


def _flash_pallas(q, k, v, block_q, block_k, interpret):
    assert q.ndim == 3 and k.ndim == 3 and v.ndim == 3
    b, lq, d = q.shape
    _, lk, _ = k.shape
    # fold softmax scale + nat->log2 conversion into q (see kernel docstring)
    q = (q.astype(jnp.float32) * (d ** -0.5 * 1.4426950408889634)).astype(q.dtype)

    # Head dim: multiples of 64 run natively; anything else pads to the
    # next 64 (zero columns leave q.k^T unchanged; zero output columns are
    # sliced away).
    d_pad = max(64, -(-d // 64) * 64)
    q = _pad_to(q, 2, d_pad)
    k = _pad_to(k, 2, d_pad)
    v = _pad_to(v, 2, d_pad)

    # Clamp blocks to the scoped-VMEM budget: the default 1024 blocks are
    # sized for the UNet's d=64 bf16 geometry; the VAE bottleneck runs a
    # single 512-dim f32 head and blew the 16M cap (measured: 19M).
    isz = max(q.dtype.itemsize, 2)

    def _vmem(bq, bk):
        return (2 * isz * bq * d_pad      # q in, double-buffered
                + 2 * 2 * isz * bk * d_pad  # k+v in
                + 2 * isz * bq * d_pad    # out
                + 2 * 4 * bq * 128        # m/l scratch
                + 4 * bq * d_pad)         # f32 acc scratch

    budget = 12 * 1024 * 1024
    while _vmem(block_q, block_k) > budget and (block_q > 256 or block_k > 256):
        if block_q >= block_k and block_q > 256:
            block_q //= 2
        else:
            block_k //= 2
    block_q = _pick_block(lq, block_q, 8)
    block_k = _pick_block(lk, block_k, 128)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k

    kernel = functools.partial(_flash_kernel, kv_len=lk, block_k=block_k)
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
    if out.shape[1] != lq or d_pad != d:
        out = out[:, :lq, :d]
    return out
