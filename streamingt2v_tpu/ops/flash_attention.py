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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, pad_k):
    """The softmax scale and ln2 conversion are pre-folded into q by the
    caller (q' = q * scale * log2(e)), so the score block needs no scalar
    multiply and the softmax runs on exp2 — one fewer full VPU pass over
    the (bq, bk) block per k step each.

    KV padding is handled WITHOUT a per-step mask: padded keys/values are
    zero, so their scores are exactly 0 in the log2 domain — they add
    nothing to the accumulator (v=0) and exactly `pad_k * 2^-m` to the
    denominator, which the finalize step subtracts.  The former per-k-step
    `lax.cond` iota+select mask HALVED throughput at non-dividing lengths
    (14400-token stage-2 geometry: 300 ms -> 139 ms, docs/PERF.md round 4).
    Numerics: the zero scores can raise the running max to 0, which only
    underflows real contributions if every true score is below about
    -24 - log2(pad_k) in the log2 domain (20+ sigma for real activations);
    the correction itself is exact in that regime."""
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
        denom = l_scr[:, 0:1]
        if pad_k:
            denom = denom - pad_k * jnp.exp2(-m_scr[:, 0:1])
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# Fixed cost of one grid step (DMA issue + kernel dispatch), expressed in
# score-matrix elements of equivalent MXU work at the d=64 bf16 rate
# (~1 us/step vs ~100 TF/s => ~4e5 elements).  Without this term a
# pure min-padding pick degenerates at lengths like 14400 (whose best
# padding fit is block 128: ceil(14400/128)*128 = 14464) into hundreds of
# tiny k-blocks per q-block — measured 18 TF/s vs 68 TF/s at the stage-1
# geometry; the overhead-aware joint pick restores large blocks at the
# cost of a few % padding (docs/PERF.md round 4).
_STEP_OVERHEAD_ELEMS = 400_000


def _block_candidates(length: int, granule: int, maximum: int) -> list:
    """All distinct block sizes (granule multiples, <= maximum) that are
    minimal for some block count n: b(n) = roundup(ceil(length/n), granule)."""
    out = set()
    for n in range(1, -(-length // granule) + 1):
        b = -(-(-(-length // n)) // granule) * granule
        if b <= maximum:
            out.add(b)
        if b <= granule:
            break
    return sorted(out, reverse=True) or [granule]


def _pick_blocks(lq: int, lk: int, fits) -> tuple:
    """Jointly pick (block_q, block_k) minimizing
    n_q * n_k * (b_q * b_k + _STEP_OVERHEAD_ELEMS) subject to the VMEM
    predicate `fits(bq, bk)`; ties go to larger blocks."""
    best = None
    for bq in _block_candidates(lq, 8, 1024):
        nq = -(-lq // bq)
        for bk in _block_candidates(lk, 128, 1024):
            if not fits(bq, bk):
                continue
            nk = -(-lk // bk)
            cost = nq * nk * (bq * bk + _STEP_OVERHEAD_ELEMS)
            key = (cost, -bq * bk)
            if best is None or key < best[0]:
                best = (key, bq, bk)
    if best is None:  # nothing fits even at minimum blocks; let it be tiny
        return 8, 128
    return best[1], best[2]


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
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Softmax attention over (B, L, D) tensors, B = batch*heads.

    block_q/block_k = 0 (default) auto-picks blocks via the joint
    overhead-aware search; explicit positive values force those blocks
    (tests / microbenchmarks)."""
    return _flash_core(q, k, v, block_q, block_k, interpret)


def _flash_kernel_packed(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                         *, pad_k, num_heads, d):
    """Head-packed variant of `_flash_kernel`: refs are (1, block, H*D)
    windows of (B, L, H*D) tensors — the layout the QKV projections
    produce — so callers never materialize the (B, L, H*D) -> (B*H, L, D)
    head-fold transposes (~21 GB/step of the stage-1 copy budget,
    docs/PERF.md round 5).  Heads are a STATIC in-kernel loop over
    D-lane slices (Mosaic rejects H-strided BlockSpecs: the last two
    block dims must be (8,128)-divisible or full, and H would sit
    second-to-last).  m/l scratch use the same (bq, H*D) lane layout with
    each head's running max/denominator replicated across its D lanes, so
    init and finalize are single whole-row ops."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, H*D)
    k = k_ref[0]
    v = v_ref[0]

    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (bq, bk) f32, log2 domain (scale folded into q by the caller)
        m_prev = m_scr[:, sl]                       # (bq, d) replicated
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new[:, 0:1])
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[:, sl] = l_scr[:, sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:, sl] = acc_scr[:, sl] * alpha + jnp.dot(
            p.astype(v.dtype), v[:, sl],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        m_scr[:, sl] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        denom = l_scr[:]
        if pad_k:
            denom = denom - pad_k * jnp.exp2(-m_scr[:])
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _attention_reference_packed(q, k, v, num_heads):
    """f32 reference over (B, L, H*D) (the packed kernel's custom VJP)."""
    b, lq, hd = q.shape
    d = hd // num_heads
    qh = q.reshape(b, lq, num_heads, d)
    kh = k.reshape(b, k.shape[1], num_heads, d)
    vh = v.reshape(b, v.shape[1], num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) * (d ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh.astype(jnp.float32))
    return o.reshape(b, lq, hd).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core_packed(q, k, v, num_heads, block_q, block_k, interpret):
    return _flash_pallas_packed(q, k, v, num_heads, block_q, block_k, interpret)


def _flash_core_packed_fwd(q, k, v, num_heads, block_q, block_k, interpret):
    out = _flash_pallas_packed(q, k, v, num_heads, block_q, block_k, interpret)
    return out, (q, k, v)


def _flash_core_packed_bwd(num_heads, block_q, block_k, interpret, saved, g):
    _, vjp = jax.vjp(
        functools.partial(_attention_reference_packed, num_heads=num_heads),
        *saved)
    return vjp(g)


_flash_core_packed.defvjp(_flash_core_packed_fwd, _flash_core_packed_bwd)


# VMEM ceiling on the packed lane width: above this the per-head scratch
# (m/l/acc at (bq, H*D) f32) shrinks blocks below the efficient range.
PACKED_MAX_LANES = 1280


def packed_applicable(num_heads: int, head_dim: int) -> bool:
    """The packed kernel needs D-lane slices Mosaic can lower cheaply
    (64-multiples) and a lane width whose scratch still leaves room for
    efficient blocks."""
    return (head_dim % 64 == 0
            and num_heads * head_dim <= PACKED_MAX_LANES)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_q", "block_k",
                                    "interpret"))
def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over head-packed (B, L, H*D) tensors — the layout
    the QKV projections emit and the out-projection consumes, so the
    (B, L, H*D) <-> (B*H, L, D) fold/unfold relayouts never hit HBM.
    Requires packed_applicable(num_heads, head_dim)."""
    return _flash_core_packed(q, k, v, num_heads, block_q, block_k, interpret)


def _flash_pallas_packed(q, k, v, num_heads, block_q, block_k, interpret):
    assert q.ndim == 3 and k.ndim == 3 and v.ndim == 3
    b, lq, hd = q.shape
    _, lk, _ = k.shape
    assert hd % num_heads == 0, (hd, num_heads)
    d = hd // num_heads
    assert packed_applicable(num_heads, d), (num_heads, d)
    q = (q.astype(jnp.float32) * (d ** -0.5 * 1.4426950408889634)).astype(q.dtype)

    isz = max(q.dtype.itemsize, 2)

    def _fits(bq, bk, budget=12 * 1024 * 1024):
        return (2 * isz * bq * hd         # q in, double-buffered
                + 2 * 2 * isz * bk * hd   # k+v in
                + 2 * isz * bq * hd       # out
                + 2 * 4 * bq * hd         # m/l scratch (per-head lanes)
                + 4 * bq * hd             # f32 acc scratch
                + 4 * 4 * bq * bk         # s/p/alpha f32 stack temporaries
                                          # (measured: Mosaic's stack peak
                                          # ran 4.2M over a 14M model at
                                          # (9216, 640) — budget for four
                                          # (bq,bk) f32 live at once)
                ) <= budget

    if block_q and block_k:
        block_q = min(block_q, -(-lq // 8) * 8)
        block_k = min(block_k, -(-lk // 128) * 128)
    else:
        block_q, block_k = _pick_blocks(lq, lk, _fits)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k

    kernel = functools.partial(_flash_kernel_packed, pad_k=kp.shape[1] - lk,
                               num_heads=num_heads, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, qp.shape[1], hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, hd), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq * lk * hd,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * num_heads * lq * lk,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    if out.shape[1] != lq:
        out = out[:, :lq]
    return out


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

    # Joint overhead-aware block pick under the scoped-VMEM budget (the
    # VAE bottleneck runs a single 512-dim f32 head and blew a 16M cap at
    # 1024-blocks; the predicate folds that constraint into the search).
    isz = max(q.dtype.itemsize, 2)

    def _fits(bq, bk, budget=14 * 1024 * 1024):
        return (2 * isz * bq * d_pad      # q in, double-buffered
                + 2 * 2 * isz * bk * d_pad  # k+v in
                + 2 * isz * bq * d_pad    # out
                + 2 * 4 * bq * 128        # m/l scratch
                + 4 * bq * d_pad          # f32 acc scratch
                + 2 * 4 * bq * bk         # s + p f32 intermediates (Mosaic)
                ) <= budget

    if block_q and block_k:  # explicit caller override (tests/benchmarks)
        block_q = min(block_q, -(-lq // 8) * 8)
        block_k = min(block_k, -(-lk // 128) * 128)
    else:
        block_q, block_k = _pick_blocks(lq, lk, _fits)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k

    kernel = functools.partial(_flash_kernel, pad_k=kp.shape[1] - lk)
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
