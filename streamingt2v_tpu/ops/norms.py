"""Normalization primitives (channel-last layouts).

The reference uses torch GroupNorm(32) everywhere (sgm
`normalization`, modules/diffusionmodules/util.py:301-311) and LayerNorm in
transformer blocks.  On TPU these are bandwidth-bound elementwise chains
that XLA fuses into neighboring matmuls/convs, so they are expressed as
plain jnp with fp32 statistics; a Pallas fusion is only warranted where a
profile shows an unfused boundary.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Opt-in fused Pallas GroupNorm (STREAMINGT2V_FUSED_GN=1).  Measured on
# v5e (round 2, after removing the phase-0 placeholder writes): XLA's own
# fusion of the jnp chain is still ~2.6x FASTER at the hot level-0 shape
# (2.7ms vs 7.3ms for (50, 9216, 320) GN+SiLU; XLA sustains ~660 GB/s on
# the two-pass chain, the Mosaic kernel ~240 GB/s), so the kernel stays
# off by default.  It only wins on wide-channel/short-row shapes such as
# (50, 576, 1280): 1.76ms vs 2.09ms.
_FUSED_GN = os.environ.get("STREAMINGT2V_FUSED_GN", "0") == "1"


def _group_stats_bf16(xs: jax.Array, c: int, num_groups: int):
    """Per-group (mean, var) of bf16 xs: (N, L, C) -> two (N, G) f32.

    Fast path: one-pass E[x^2]-E[x]^2 with both sums as MXU matmuls
    against a one-hot (C, G) matrix; the f32 accumulation is exact, but
    bf16 x*x rounds each square by up to 2^-8 relative, so when a group
    sits at a large common offset with a small spread — var/E[x^2]
    below ~2^-6, i.e. std < ~12% of |mean| — the subtraction amplifies
    that rounding into a wrong (even clamped-to-zero) variance.  A
    lax.cond re-computes E[(x-mean)^2] through a second matmul pass only
    when any group is inside that cancellation floor, so the common case
    pays nothing.  Pinned by
    tests/test_ops.py::test_group_norm_large_offset_low_variance."""
    cnt = xs.shape[1] * (c // num_groups)
    ghot = jnp.equal(
        jnp.arange(c)[:, None] // (c // num_groups),
        jnp.arange(num_groups)[None, :],
    ).astype(xs.dtype)
    # bf16 inputs accumulate exactly on the MXU; f32 inputs need HIGHEST
    # or the MXU's DEFAULT f32 path truncates them to bf16 (measured
    # 1.7e-2 stat error on v5e — see ops/fused_group_norm.py).
    prec = (jax.lax.Precision.HIGHEST if xs.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s1 = jnp.einsum("nlc,cg->ng", xs, ghot, preferred_element_type=jnp.float32,
                    precision=prec)
    s2 = jnp.einsum("nlc,cg->ng", xs * xs, ghot,
                    preferred_element_type=jnp.float32, precision=prec)
    mean_g = s1 / cnt
    m2 = mean_g * mean_g
    var_fast = jnp.maximum(s2 / cnt - m2, 0.0)
    # bf16 square rounding floor: err(E[x^2]) can reach ~2^-9 * E[x^2]
    # systematically; require var to clear it with an 8x margin.
    floor = (m2 + var_fast) * (2.0 ** -6)
    suspicious = jnp.any(var_fast < floor)

    rep = c // num_groups

    def _robust(_):
        # subtract the (accurately known) group mean before squaring; the
        # differences are small so their bf16 squares are well-resolved.
        mc = jnp.repeat(mean_g, rep, axis=1)[:, None, :].astype(xs.dtype)
        d = xs - mc
        sd = jnp.einsum("nlc,cg->ng", d * d, ghot,
                        preferred_element_type=jnp.float32, precision=prec)
        return jnp.maximum(sd / cnt, 0.0)

    var_g = jax.lax.cond(suspicious, _robust, lambda _: var_fast, None)
    return mean_g, var_g


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over the trailing channel axis of (..., C), optionally fused
    with SiLU (`act='silu'`), the UNet's ubiquitous norm->act pair."""
    c = x.shape[-1]
    # Clamp for tiny test configs; production channel counts are >=128 so
    # this never diverges from the reference GroupNorm(32, C).
    num_groups = min(num_groups, c)
    assert c % num_groups == 0, (c, num_groups)

    if (
        _FUSED_GN
        and x.ndim == 4
        and act in (None, "silu")
        and jax.default_backend() == "tpu"
    ):
        from streamingt2v_tpu.ops.fused_group_norm import fits_fused, fused_group_norm

        n, hh, ww, cc = x.shape
        if fits_fused(hh * ww, cc, x.dtype.itemsize):
            out = fused_group_norm(
                x.reshape(n, hh * ww, cc), scale, bias,
                num_groups=num_groups, eps=eps, act=act or "none",
            )
            return out.reshape(x.shape)
    orig_dtype = x.dtype
    # Statistics over all non-batch dims (group channels + spatial dims),
    # in the E[x^2] - E[x]^2 form so nothing f32-wide is materialized: the
    # naive jnp.mean/jnp.var formulation made XLA write + re-read a full
    # f32 copy of the activation per GN — 32.6 GB/step of pure copies in
    # the denoise step (docs/PERF.md).
    lead = x.shape[0]
    l = 1
    for d in x.shape[1:-1]:
        l *= d
    xs = x.reshape(lead, l, c)
    if (l * (c // num_groups) >= 1 << 14 and c % num_groups == 0
            and x.dtype == jnp.bfloat16):
        # bf16 only: for f32 inputs (the VAE) there is no upcast copy to
        # avoid, and the einsum path materializes x*x — an extra
        # full-size f32 tensor that OOMed the 720p VAE encode.
        # Large reduce span: per-group sums via MXU matmuls against a
        # one-hot (C, G) matrix.  XLA's strided group reduction (minor-dim
        # partial reduce of width C/G) ran at 13-25 ms per instance at the
        # production geometry; the matmul form is bandwidth-bound (~0.5 ms).
        mean_g, var_g = _group_stats_bf16(xs, c, num_groups)
        inv_g = jax.lax.rsqrt(var_g + eps)
        rep = c // num_groups
        mean = jnp.repeat(mean_g, rep, axis=1)[:, None, :]   # (N, 1, C)
        inv = jnp.repeat(inv_g, rep, axis=1)[:, None, :]
        xf = (xs.astype(jnp.float32) - mean) * inv
        out = xf.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    else:
        # Fallback path (f32 inputs / small spans): two-pass shifted
        # variance — E[(x-mean)^2] — so a large common offset cannot
        # cancel the small variance (E[x^2]-E[x]^2 in f32 loses ~7 digits
        # when std/|mean| ~ 1e-4).  These tensors are small or already
        # f32, so the extra materialization the one-pass form avoids on
        # the bf16 hot path does not matter here.
        xg = x.reshape(*x.shape[:-1], num_groups, c // num_groups)
        red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = jnp.mean(xg, axis=red_axes, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(xg.astype(jnp.float32) - mean),
                       axis=red_axes, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xf = (xg.astype(jnp.float32) - mean) * inv
        out = xf.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(act)
    return out.astype(orig_dtype)


def group_norm_affine(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> tuple:
    """GroupNorm reduced to a per-(batch-row, channel) affine: returns
    (a, b) f32 of shape (N, C) such that
    group_norm(x, scale, bias, act=act) == act(x * a[:, None..] + b).
    Lets consumers (the Pallas temporal conv) fuse the normalize+act pass
    into their input read instead of materializing it (docs/PERF.md).
    Stats via the same MXU matmul group sums as group_norm."""
    c = x.shape[-1]
    num_groups = min(num_groups, c)
    assert c % num_groups == 0, (c, num_groups)
    lead = x.shape[0]
    l = 1
    for d in x.shape[1:-1]:
        l *= d
    xs = x.reshape(lead, l, c)
    mean_g, var_g = _group_stats_bf16(xs, c, num_groups)
    inv_g = jax.lax.rsqrt(var_g + eps)
    rep = c // num_groups
    mean = jnp.repeat(mean_g, rep, axis=1)   # (N, C)
    inv = jnp.repeat(inv_g, rep, axis=1)
    a = inv * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean * a
    return a, b


def layer_norm(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    orig_dtype = x.dtype
    # same single-materialization trick as group_norm above
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
