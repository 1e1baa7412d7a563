"""Pallas temporal (kt,1,1) convolution for (B, T, S, C) activations.

The UNet's temporal ResBlocks (reference video_model.py:46-59) and the
VAE's AE3DConv run Conv3d with kernel (3,1,1): a pure time-axis mix that
is per spatial position just  out[t] = sum_k x[t+k-1] @ W[k] + b.
XLA's conv_general_dilated lowering of this shape was measured at only
~37 TF/s effective on v5e (7.7 ms at the level-0 geometry) — it pays
im2col traffic and layout shuffles for what is really three matmuls.

This kernel streams (T, block_s, C) tiles through VMEM once, keeps all
kt weight taps resident, and issues kt statically-shifted matmuls per
tile, accumulating in f32 registers.  Traffic = read x once + write out
once; MXU work = the useful FLOPs only.

Zero padding at the temporal edges matches torch Conv3d padding=(1,0,0)
and flax nn.Conv SAME (goldens in tests/test_torch_goldens.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, kt, t):
    _conv_body(x_ref, w_ref, b_ref, o_ref, None, None, None, None, kt=kt, t=t)


def _kernel_res(x_ref, w_ref, b_ref, res_ref, rw_ref, o_ref, *, kt, t):
    _conv_body(x_ref, w_ref, b_ref, o_ref, res_ref, rw_ref, None, None,
               kt=kt, t=t)


def _kernel_pre(x_ref, w_ref, b_ref, pa_ref, pb_ref, o_ref, *, kt, t):
    _conv_body(x_ref, w_ref, b_ref, o_ref, None, None, pa_ref, pb_ref,
               kt=kt, t=t)


def _kernel_pre_res(x_ref, w_ref, b_ref, pa_ref, pb_ref, res_ref, rw_ref,
                    o_ref, *, kt, t):
    _conv_body(x_ref, w_ref, b_ref, o_ref, res_ref, rw_ref, pa_ref, pb_ref,
               kt=kt, t=t)


def _conv_body(x_ref, w_ref, b_ref, o_ref, res_ref, rw_ref, pa_ref, pb_ref,
               *, kt, t):
    # x_ref: (1, T, bs, C); w_ref: (kt, C, bco); b_ref: (1, bco)
    # res_ref: (1, T, bs, bco) residual; rw_ref: (B, T) per-frame weight
    # pa_ref/pb_ref: (B, C) per-(row, channel) input affine (fused GN+SiLU
    # prologue: xn = silu(x*a + b))
    # o_ref: (1, T, bs, bco)
    bs = x_ref.shape[2]
    bco = o_ref.shape[3]
    if pa_ref is not None:
        i = pl.program_id(0)
        pa = pa_ref[i]  # (C,) f32, lane-aligned broadcast below
        pb = pb_ref[i]
        xin = x_ref[0].astype(jnp.float32) * pa + pb
        xin = (xin * jax.nn.sigmoid(xin)).astype(x_ref.dtype)  # silu
    else:
        xin = x_ref[0]
    acc = jnp.zeros((t * bs, bco), jnp.float32)
    lo = kt // 2
    for k in range(kt):
        # tap k reads x[t + k - lo] -> contributes to out rows where the
        # read stays in [0, T): out[max(0, lo-k) : T - max(0, k-lo)]
        o0 = max(0, lo - k)
        x0 = max(0, k - lo)
        tt = t - x0 - o0
        if tt <= 0:
            continue
        xs = xin[x0:x0 + tt]  # (tt, bs, C)
        part = jax.lax.dot(
            xs.reshape(tt * bs, x_ref.shape[3]), w_ref[k],
            preferred_element_type=jnp.float32,
        )
        if o0 or tt < t:  # zero-fill rows outside this tap's range
            part = jnp.pad(part, ((o0 * bs, (t - o0 - tt) * bs), (0, 0)))
        acc = acc + part
    acc = (acc + b_ref[0]).reshape(t, bs, bco)
    if res_ref is not None:
        # fused scaled-residual epilogue: res + w[b,t] * conv  (the UNet
        # VideoResBlock blend collapses to this form, unet_blocks.py).
        # res_w lives in SMEM; per-frame scalar * slab broadcast (a lane
        # vector reshaped to sublanes is an unsupported Mosaic shape cast).
        i = pl.program_id(0)
        for tt in range(t):
            o_ref[0, tt] = (
                res_ref[0, tt].astype(jnp.float32) + rw_ref[i, tt] * acc[tt]
            ).astype(o_ref.dtype)
    else:
        o_ref[0] = acc.astype(o_ref.dtype)


# v5e scoped-VMEM cap is 16M; leave room for Mosaic double buffering of
# the x/out tiles plus the resident weights and the f32 accumulator.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_blocks(t: int, s: int, c: int, c_out: int, kt: int, dsize: int,
                 fuse_res: bool = False):
    """Choose (block_s, block_co).  Full-C contraction per tile; weights
    are grid-constant so Mosaic fetches them once."""
    for bco in (min(-(-c_out // 128) * 128, 512), 256, 128):
        if bco > -(-c_out // 128) * 128:
            continue
        for bs in (512, 256, 128, 64, 32, 16, 8):
            if bs > max(8, -(-s // 8) * 8):
                continue
            x_tile = 2 * t * bs * c * dsize          # double-buffered
            o_tile = 2 * t * bs * bco * dsize
            if fuse_res:
                o_tile += 2 * t * bs * bco * dsize   # res tile
            w_res = kt * c * bco * dsize * 2
            acc = 4 * t * bs * bco
            if x_tile + o_tile + w_res + acc <= _VMEM_BUDGET:
                return bs, bco
    return 8, 128


def _tc_reference(x, w, b, res, res_w, pre_a, pre_b):
    """Pure-jnp f32 reference (the custom VJP of the Pallas forward)."""
    kt = w.shape[0]
    lo = kt // 2
    t = x.shape[1]
    h = x.astype(jnp.float32)
    if pre_a is not None:
        h = h * pre_a[:, None, None, :] + pre_b[:, None, None, :]
        h = h * jax.nn.sigmoid(h)
    hp = jnp.pad(h, ((0, 0), (lo, kt - 1 - lo), (0, 0), (0, 0)))
    out = sum(
        jnp.einsum("btsc,cd->btsd", hp[:, k:k + t], w[k].astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
        for k in range(kt)
    ) + b.astype(jnp.float32)
    if res is not None:
        out = res.astype(jnp.float32) + res_w[:, :, None, None] * out
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _tc_core(x, w, b, res, res_w, pre_a, pre_b,
             block_s, block_co, interpret):
    return _tc_pallas(x, w, b, res, res_w, pre_a, pre_b,
                      block_s, block_co, interpret)


def _tc_core_fwd(x, w, b, res, res_w, pre_a, pre_b,
                 block_s, block_co, interpret):
    out = _tc_pallas(x, w, b, res, res_w, pre_a, pre_b,
                     block_s, block_co, interpret)
    return out, (x, w, b, res, res_w, pre_a, pre_b)


def _tc_core_bwd(block_s, block_co, interpret, saved, g):
    x, w, b, res, res_w, pre_a, pre_b = saved
    live = [i for i, a in enumerate(saved) if a is not None]
    def f(*diff_args):
        full = list(saved)
        for i, a in zip(live, diff_args):
            full[i] = a
        return _tc_reference(*full)
    _, vjp = jax.vjp(f, *[saved[i] for i in live])
    grads_live = vjp(g)
    out = [None] * 7
    for i, gr in zip(live, grads_live):
        out[i] = gr
    return tuple(out)


_tc_core.defvjp(_tc_core_fwd, _tc_core_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "block_s", "block_co"))
def temporal_conv(x: jax.Array, w: jax.Array, b: jax.Array,
                  res: "jax.Array | None" = None,
                  res_w: "jax.Array | None" = None,
                  pre_a: "jax.Array | None" = None,
                  pre_b: "jax.Array | None" = None, *,
                  block_s: int = 0, block_co: int = 0,
                  interpret: bool = False) -> jax.Array:
    """x: (B, T, S, C); w: (kt, C, C_out); b: (C_out,) -> (B, T, S, C_out).

    Time-axis conv, stride 1, zero 'SAME' padding on T.  With `res`
    ((B, T, S, C_out)) and `res_w` ((B, T) f32), the epilogue computes
    `res + res_w[b,t] * conv` in-kernel — the UNet VideoResBlock's
    residual-add + AlphaBlender collapse to exactly this form, saving the
    separate add and blend HBM passes (docs/PERF.md)."""
    return _tc_core(x, w, b, res, res_w, pre_a, pre_b,
                    block_s, block_co, interpret)


def _tc_pallas(x, w, b, res, res_w, pre_a, pre_b,
               block_s, block_co, interpret):
    bsz, t, s, c = x.shape
    kt, wc, c_out = w.shape
    assert wc == c, (w.shape, x.shape)
    fuse_res = res is not None
    if fuse_res:
        assert res.shape == (bsz, t, s, c_out), (res.shape, x.shape)
        assert res_w is not None and res_w.shape == (bsz, t), res_w
    fuse_pre = pre_a is not None
    if fuse_pre:
        assert pre_a.shape == (bsz, c) and pre_b.shape == (bsz, c)

    bs, bco = _pick_blocks(t, s, c, c_out, kt, max(x.dtype.itemsize, 2),
                           fuse_res)
    bs = block_s or bs
    bco = block_co or bco
    s_pad = (-s) % bs
    if s_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
        if fuse_res:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
    co_pad = (-c_out) % bco
    if co_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, co_pad)))
        b = jnp.pad(b, (0, co_pad))
        if fuse_res:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, 0), (0, co_pad)))
    ns = x.shape[2] // bs
    nco = w.shape[2] // bco

    in_specs = [
        pl.BlockSpec((1, t, bs, c), lambda i, j, o: (i, 0, j, 0)),
        pl.BlockSpec((kt, c, bco), lambda i, j, o: (0, 0, o)),
        pl.BlockSpec((1, bco), lambda i, j, o: (0, o)),
    ]
    args = [x, w, b.reshape(1, -1).astype(jnp.float32)]
    if fuse_pre:
        # full-array VMEM residency (block == array dims); row-indexed by
        # program_id(0) in-kernel
        in_specs += [
            pl.BlockSpec((bsz, c), lambda i, j, o: (0, 0)),
            pl.BlockSpec((bsz, c), lambda i, j, o: (0, 0)),
        ]
        args += [pre_a.astype(jnp.float32), pre_b.astype(jnp.float32)]
    if fuse_res:
        in_specs += [
            pl.BlockSpec((1, t, bs, bco), lambda i, j, o: (i, 0, j, o)),
            # scalars in SMEM; the kernel indexes [program_id(0), t]
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [res, res_w.astype(jnp.float32)]
    kernel = functools.partial(
        _kernel_pre_res if (fuse_pre and fuse_res) else
        _kernel_pre if fuse_pre else
        _kernel_res if fuse_res else _kernel, kt=kt, t=t)

    out = pl.pallas_call(
        kernel,
        grid=(bsz, ns, nco),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, bs, bco), lambda i, j, o: (i, 0, j, o)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, x.shape[2], w.shape[2]), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t * s * c * c_out * kt,
            bytes_accessed=(x.size + w.size + (2 if fuse_res else 1)
                            * bsz * t * s * c_out) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if s_pad or co_pad:
        out = out[:, :, :s, :c_out]
    return out


def fits_temporal_conv(t: int, c: int, c_out: int, kt: int) -> bool:
    """Gate: the kernel needs one (T, 8, C) x-tile + resident weights under
    the VMEM budget, and kt centered (odd)."""
    if kt % 2 != 1 or kt > 5:
        return False
    dsize = 2
    return (2 * t * 8 * c + kt * c * 128 * 2) * dsize + 4 * t * 8 * 128 \
        <= _VMEM_BUDGET
