"""Fused GEGLU feed-forward Pallas kernel.

Computes `(a * gelu_erf(b)) @ W2 + b2` with `[a ‖ b] = x @ W1 + b1` in one
kernel, never materializing the (N, 2*inner) intermediate in HBM.  The
reference's FF (attention.py:52-76) costs two XLA matmuls plus a full HBM
round-trip of the 8x-wide GEGLU tensor per call; the profile shows that
round-trip is a top-3 bandwidth consumer in the UNet step (docs/PERF.md).

Grid: (N / block_n, inner / block_i) with the inner axis innermost —
the f32 output accumulator persists across inner blocks (TPU grids run
sequentially), exactly the flash-attention scratch pattern.

Numerics: f32 accumulation on both matmuls, erf-based GELU in f32 (matches
torch F.gelu default / the jnp path bit-for-bit within bf16 rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_exact(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max error
    1.5e-7).  Mosaic has no erf/erfc lowering, so
    jax.nn.gelu(approximate=False) cannot be used inside the kernel.
    Used when the output dtype is f32 and full precision matters."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_poly(x):
    """Odd polynomial erf: erf(x) ~= xc * P(xc^2), xc = clip(x, -2.6, 2.6);
    max abs error 1.8e-4 (erf(2.6) is within a bf16 half-ulp of 1, so the
    clamp is exact in bf16).  Pure FMA chain — no exp, no divide — measured
    16% faster per FF call than the A&S form at the level-0 geometry
    (docs/PERF.md).  Used for bf16 outputs, where 1.8e-4 sits ~20x below
    the output-cast rounding.  Coefficients: Chebyshev least-squares fit of
    erf(x)/x in t = x^2 over [0, 2.6^2]."""
    c0, c1, c2, c3, c4, c5, c6 = (
        1.1282794791496844, -0.37459065904630573, 0.1088857007018173,
        -0.02290906206069749, 0.0032126277462373445,
        -0.00026252115557275313, 9.2928026424243604e-06)
    xc = jnp.clip(x, -2.6, 2.6)
    t = xc * xc
    poly = c0 + t * (c1 + t * (c2 + t * (c3 + t * (c4 + t * (c5 + t * c6)))))
    return xc * poly


def _gelu_erf(x, exact):
    erf = _erf_exact if exact else _erf_poly
    return 0.5 * x * (1.0 + erf(x * 0.7071067811865476))


def _ff_kernel(x_ref, w1a_ref, w1b_ref, b1a_ref, b1b_ref, w2_ref, b2_ref,
               lns_ref, lnb_ref, o_ref, acc_scr, xn_scr, *,
               exact_gelu, ln, residual, c_valid):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if ln:
            # pre-LN fused in-kernel: per-row stats over the (full-C) lane
            # axis, computed once per row block and cached for the i-sweep.
            # Fusing the LN here (instead of an XLA reduce fusion feeding
            # the custom call) also removes the {1,2,0}<->{2,1,0} relayout
            # copies XLA inserted on both sides of the call: its layout
            # assignment prefers a channel-second-minor layout for reduce
            # chains while the kernel requires the dense row-major layout
            # (docs/PERF.md).
            xf = x_ref[:].astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
            inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
            xn = (xf - mean) * inv * lns_ref[0] + lnb_ref[0]
            xn_scr[:] = xn.astype(xn_scr.dtype)

    x = xn_scr[:] if ln else x_ref[:]
    a = jax.lax.dot(
        x, w1a_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + b1a_ref[0]
    b = jax.lax.dot(
        x, w1b_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + b1b_ref[0]
    g = a * _gelu_erf(b, exact_gelu)
    acc_scr[:] += jax.lax.dot(
        g.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(i == ni - 1)
    def _finalize():
        out = acc_scr[:] + b2_ref[0]
        if residual:
            # out-features == in-features for the residual FFs; padded
            # c rows beyond c_valid are sliced away by the caller.
            out = out + x_ref[:, :out.shape[-1]].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def _pick(n: int, maximum: int, granule: int) -> int:
    if n <= maximum:
        return -(-n // granule) * granule
    best, best_padded = granule, None
    for c in range(maximum, granule - 1, -granule):
        padded = -(-n // c) * c
        if best_padded is None or padded < best_padded:
            best, best_padded = c, padded
            if padded == n:
                break
    return best


# scoped-VMEM budget for block selection: v5e caps kernel stack at 16M and
# Mosaic double-buffers the grid blocks; leave headroom for temporaries.
_VMEM_BUDGET = 11 * 1024 * 1024


def _budget_blocks(c: int, c_out: int, dsize: int,
                   max_n: int, max_i: int) -> tuple:
    """Pick (block_n, block_i) minimizing modeled HBM traffic under the
    scoped-VMEM budget.

    Traffic model (Mosaic skips re-fetching a block whose index is
    unchanged between consecutive grid steps; the inner grid axis is i):
      x:       fetched once per n block (index constant across the i sweep)
      weights: fetched every step when ii > 1 (index changes each step);
               fetched ONCE total when ii == 1 (index always (0, i)) —
               which is why a full-inner block (ii=1) wins whenever the
               whole W1/W2 pair + f32 temporaries fit VMEM (true at the
               320-channel level-0 geometry: 2.4 MB of weights vs 1.1 GB
               of per-step refetches with ii=4)."""
    inner_full = -(-max_i // 128) * 128
    best = (128, 128)
    best_traffic = None
    for bn in (1024, 512, 256, 128):
        if bn > max(-(-max_n // 8) * 8, 128):
            continue
        for bi in dict.fromkeys((inner_full, 1024, 512, 256, 128)):
            if bi > inner_full:
                continue
            est = (2 * dsize * (bn * c + 2 * c * bi + bi * c_out + bn * c_out)
                   + 4 * bn * c_out + 12 * bn * bi + dsize * bn * c)
            if est > _VMEM_BUDGET:
                continue
            nn_ = -(-max_n // bn)
            ii = -(-inner_full // bi)
            w_bytes = (2 * c * bi + bi * c_out) * dsize
            x_bytes = bn * c * dsize
            out_bytes = bn * c_out * dsize
            traffic = nn_ * x_bytes + nn_ * out_bytes + (
                nn_ * ii * w_bytes if ii > 1 else w_bytes
            )
            if best_traffic is None or traffic < best_traffic:
                best, best_traffic = (bn, bi), traffic
    return best


def _ff_reference(x, w1, b1, w2, b2, ln_scale, ln_bias, residual):
    """Pure-jnp f32 reference of the fused op, used as the VJP of the
    Pallas forward (Pallas autodiff cannot differentiate these kernels;
    the backward runs as ordinary XLA math)."""
    inner = w2.shape[0]
    h = x.astype(jnp.float32)
    if ln_scale is not None:
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(h * h, axis=-1, keepdims=True)
                          - mean * mean, 0.0)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    z = h @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    a, b = z[..., :inner], z[..., inner:]
    g = a * jax.nn.gelu(b, approximate=False)
    out = g @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    if residual:
        out = x.astype(jnp.float32) + out
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _geglu_core(x, w1, b1, w2, b2, ln_scale, ln_bias,
                residual, block_n, block_i, interpret):
    return _geglu_pallas(x, w1, b1, w2, b2, ln_scale, ln_bias,
                         residual, block_n, block_i, interpret)


def _geglu_core_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias,
                    residual, block_n, block_i, interpret):
    out = _geglu_pallas(x, w1, b1, w2, b2, ln_scale, ln_bias,
                        residual, block_n, block_i, interpret)
    return out, (x, w1, b1, w2, b2, ln_scale, ln_bias)


def _geglu_core_bwd(residual, block_n, block_i, interpret, saved, g):
    x, w1, b1, w2, b2, ln_scale, ln_bias = saved
    if ln_scale is None:
        def f(x_, w1_, b1_, w2_, b2_):
            return _ff_reference(x_, w1_, b1_, w2_, b2_, None, None, residual)
        _, vjp = jax.vjp(f, x, w1, b1, w2, b2)
        gx, gw1, gb1, gw2, gb2 = vjp(g)
        return gx, gw1, gb1, gw2, gb2, None, None
    _, vjp = jax.vjp(
        lambda *a: _ff_reference(*a, residual), x, w1, b1, w2, b2,
        ln_scale, ln_bias)
    return vjp(g)


_geglu_core.defvjp(_geglu_core_fwd, _geglu_core_bwd)


@functools.partial(jax.jit, static_argnames=("block_n", "block_i", "residual",
                                             "interpret"))
def geglu_ff(
    x: jax.Array,      # (..., C)
    w1: jax.Array,     # (C, 2*inner): [a-half ‖ b-half] (torch GEGLU layout)
    b1: jax.Array,     # (2*inner,)
    w2: jax.Array,     # (inner, C_out)
    b2: jax.Array,     # (C_out,)
    *,
    ln_scale: "jax.Array | None" = None,  # fuse pre-LN (eps 1e-5) in-kernel
    ln_bias: "jax.Array | None" = None,
    residual: bool = False,               # return x + FF(...) (needs C_out == C)
    block_n: int = 0,  # 0 = auto (scoped-VMEM budget)
    block_i: int = 0,
    interpret: bool = False,
) -> jax.Array:
    if ln_scale is not None and ln_bias is None:
        ln_bias = jnp.zeros(x.shape[-1:], jnp.float32)
    return _geglu_core(x, w1, b1, w2, b2, ln_scale, ln_bias,
                       residual, block_n, block_i, interpret)


def _geglu_pallas(x, w1, b1, w2, b2, ln_scale, ln_bias,
                  residual, block_n, block_i, interpret):
    lead = x.shape[:-1]
    c = x.shape[-1]
    inner = w2.shape[0]
    c_out = w2.shape[1]
    assert w1.shape == (c, 2 * inner), (w1.shape, c, inner)
    ln = ln_scale is not None
    if residual:
        assert c_out == c, (c_out, c)

    n = 1
    for d in lead:
        n *= d
    xf = x.reshape(n, c)

    if not block_n or not block_i:
        auto_n, auto_i = _budget_blocks(c, c_out, x.dtype.itemsize, n, inner)
        block_n = block_n or auto_n
        block_i = block_i or auto_i
    bn = _pick(n, block_n, 8)
    bi = _pick(inner, block_i, 128)
    n_pad = (-n) % bn
    if n_pad:
        xf = jnp.pad(xf, ((0, n_pad), (0, 0)))
    i_pad = (-inner) % bi
    w1a, w1b = w1[:, :inner], w1[:, inner:]
    b1a, b1b = b1[:inner], b1[inner:]
    if i_pad:
        w1a = jnp.pad(w1a, ((0, 0), (0, i_pad)))
        w1b = jnp.pad(w1b, ((0, 0), (0, i_pad)))
        b1a = jnp.pad(b1a, (0, i_pad))
        b1b = jnp.pad(b1b, (0, i_pad))
        w2 = jnp.pad(w2, ((0, i_pad), (0, 0)))
        # padded b-half rows give gelu(0)=0, so they contribute nothing

    nn_ = xf.shape[0] // bn
    ii = w2.shape[0] // bi

    if ln:
        lns = ln_scale.reshape(1, c).astype(jnp.float32)
        lnb = (jnp.zeros((1, c), jnp.float32) if ln_bias is None
               else ln_bias.reshape(1, c).astype(jnp.float32))
    else:
        lns = jnp.ones((1, c), jnp.float32)
        lnb = jnp.zeros((1, c), jnp.float32)

    kernel = functools.partial(
        _ff_kernel, exact_gelu=x.dtype == jnp.float32, ln=ln,
        residual=residual, c_valid=c_out,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nn_, ii),
        in_specs=[
            pl.BlockSpec((bn, c), lambda ni_, i: (ni_, 0)),
            pl.BlockSpec((c, bi), lambda ni_, i: (0, i)),
            pl.BlockSpec((c, bi), lambda ni_, i: (0, i)),
            pl.BlockSpec((1, bi), lambda ni_, i: (0, i)),
            pl.BlockSpec((1, bi), lambda ni_, i: (0, i)),
            pl.BlockSpec((bi, c_out), lambda ni_, i: (i, 0)),
            pl.BlockSpec((1, c_out), lambda ni_, i: (0, 0)),
            pl.BlockSpec((1, c), lambda ni_, i: (0, 0)),
            pl.BlockSpec((1, c), lambda ni_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, c_out), lambda ni_, i: (ni_, 0)),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, c_out), jnp.float32),
                        pltpu.VMEM((bn, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * 2 * inner + 2 * n * inner * c_out,
            bytes_accessed=(xf.size + w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=n * inner,
        ),
        interpret=interpret,
    )(xf, w1a, w1b, b1a[None], b1b[None], w2, b2[None], lns, lnb)
    if n_pad:
        out = out[:n]
    return out.reshape(lead + (c_out,))
