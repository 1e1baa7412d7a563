"""VideoUNet building blocks (channel-last, TPU layouts).

Rebuilds the reference's UNet substrate:
  - `FeedForward`/GEGLU, `CrossAttention`, `BasicTransformerBlock`
    (reference models/svd/sgm/modules/attention.py:52-593)
  - `VideoTransformerBlock` temporal transformer
    (reference modules/video_attention.py:23-171)
  - `SpatialVideoTransformer` spatial+temporal pair with AlphaBlender
    (reference modules/video_attention.py:174-333)
  - openaimodel `ResBlock` (spatial + dims=3 temporal variants) and the
    `VideoResBlock` spatial/temporal pair (reference
    openaimodel.py:210-356, models/diffusion/video_model.py:16-85)
  - UNet `Downsample`/`Upsample` (reference openaimodel.py:107-207)

Layout conventions:
  - 5D activations (B, T, H, W, C); spatial modules fold T into batch,
    temporal modules fold (H W) into batch.
  - `emb` (time + vector conditioning) is (B, T, D).
  - Attention routes through ops.attention (Pallas flash on TPU for the
    large spatial geometries).

Blend orientation: the UNet AlphaBlender computes
`alpha * spatial + (1 - alpha) * temporal` with alpha = sigmoid(mix) and
alpha forced to 1 for image-only rows (learned_with_images, reference
util.py:312-370) — opposite of the VAE VideoResBlock orientation.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.ops import attention, group_norm, layer_norm, timestep_embedding
from streamingt2v_tpu.ops.attention import attention_pre_split
from streamingt2v_tpu.parallel.sharding import shard


def _gn_params(module: nn.Module, name: str, c: int):
    scale = module.param(f"{name}_scale", nn.initializers.ones, (c,))
    bias = module.param(f"{name}_bias", nn.initializers.zeros, (c,))
    return scale, bias


def _ln_params(module: nn.Module, name: str, c: int):
    scale = module.param(f"{name}_scale", nn.initializers.ones, (c,))
    bias = module.param(f"{name}_bias", nn.initializers.zeros, (c,))
    return scale, bias


class _DenseParams(nn.Module):
    """Declares an nn.Dense-shaped param pair without binding the matmul,
    so FeedForward can route through the fused Pallas kernel while keeping
    the checkpoint-mapped param tree (proj/kernel, proj/bias, ...)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class FeedForward(nn.Module):
    """GEGLU feed-forward (attention.py:52-76): proj to 2*inner, a*gelu(b),
    project back.  On TPU the whole block runs as one fused Pallas kernel
    (ops/fused_ff.py) — the (N, 2*inner) GEGLU intermediate never touches
    HBM; elsewhere the plain jnp path is numerically identical."""

    dim_out: int
    mult: int = 4

    @nn.compact
    def __call__(self, x, ln=None, residual: bool = False):
        """`ln=(scale, bias)` fuses the pre-LN (eps 1e-5) and `residual`
        fuses the `x + FF(LN(x))` skip into the Pallas kernel — one custom
        call for the whole pre-LN residual FF pattern, avoiding the LN
        materialization, the relayout copies XLA inserts around the custom
        call, and the separate residual-add pass (docs/PERF.md)."""
        inner = int(x.shape[-1] * self.mult)
        w1, b1 = _DenseParams(inner * 2, name="proj")(x.shape[-1])
        w2, b2 = _DenseParams(self.dim_out, name="out")(inner)
        if residual:
            assert self.dim_out == x.shape[-1]

        n_rows = 1
        for d in x.shape[:-1]:
            n_rows *= d
        if (jax.default_backend() == "tpu" and n_rows >= 256
                and inner % 128 == 0
                and os.environ.get("STREAMINGT2V_NO_PALLAS") != "1"):
            from streamingt2v_tpu.ops.fused_ff import geglu_ff

            return geglu_ff(
                x, w1.astype(x.dtype), b1.astype(x.dtype),
                w2.astype(x.dtype), b2.astype(x.dtype),
                ln_scale=None if ln is None else ln[0],
                ln_bias=None if ln is None else ln[1],
                residual=residual,
            )

        x_in = x
        if ln is not None:
            x = layer_norm(x, ln[0], ln[1])
        h = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
        a, b = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: torch F.gelu's default, used by sgm/diffusers
        h = a * jax.nn.gelu(b.astype(jnp.float32), approximate=False).astype(b.dtype)
        h = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
        return x_in + h if residual else h


class CrossAttention(nn.Module):
    """q/k/v projections (no bias) + output projection (attention.py:262).
    Self-attention when context is None.

    `pre`/`post` are optional layout adapters applied between the
    projections and the attention core: the temporal blocks project in the
    spatial-major layout (dense channel-minor fusions) and only transpose
    q/k/v/o around the T-axis attention itself (docs/PERF.md)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, pre=None, post=None, pre_split=False):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context

        if (context is not None and context.shape[1] == 1 and pre is None
                and post is None):
            # Single-kv-token cross attention (the SVD pooled-CLIP context,
            # use_spatial_context with L=1): softmax over one key is exactly
            # 1.0, so the attention output IS v for every query — computing
            # q, the (Lq, 1) scores, and the broadcasted p@v is pure waste
            # (~8 ms/step at the production geometry, scripts/bench_blocks).
            # to_q/to_k params are still materialized (checkpoint parity);
            # their 1-token applications are dead code XLA eliminates.
            nn.Dense(inner, use_bias=False, name="to_q")(x[:, :1])
            nn.Dense(inner, use_bias=False, name="to_k")(ctx[:, :1])
            v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
            out = nn.Dense(x.shape[-1], name="to_out")(v)  # (B, 1, C)
            return jnp.broadcast_to(out, x.shape[:2] + (out.shape[-1],))

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        if pre is not None:
            q, k, v = pre(q), pre(k), pre(v)
        if pre_split:
            # pre produced head-folded (B*H, L, D) in one permutation
            o = attention_pre_split(q, k, v)
        else:
            o = attention(q, k, v, num_heads=self.heads)
        if post is not None:
            o = post(o)
        return nn.Dense(x.shape[-1], name="to_out")(o)


class APMContextMixer(nn.Module):
    """Appearance Preservation Module context mixing
    (BasicTransformerBlockWithAPM, attention.py:596-620): the 16+1 APM CLIP
    tokens are mixed by a width-3 conv over the embedding axis, layer-normed,
    and gated into the first (SVD) token by a learned silu(alpha).  Off by
    default (config.yaml:115)."""

    @nn.compact
    def __call__(self, context):
        if context.shape[1] <= 1:
            return context
        d = context.shape[-1]
        # torch Conv1d(tokens, 1, k=3, padding=same) over the embedding axis
        mixed = nn.Conv(1, (3,), padding="SAME", name="apm_conv")(
            context.transpose(0, 2, 1)
        ).transpose(0, 2, 1)  # (B, 1, D)
        s, b = _ln_params(self, "apm_ln", d)
        mixed = layer_norm(mixed, s, b)
        alpha = self.param("apm_alpha", nn.initializers.zeros, ())
        return context[:, :1] + mixed * jax.nn.silu(alpha.astype(jnp.float32)).astype(
            context.dtype
        )


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU-FF, each pre-LN residual
    (attention.py:464-593).  With `use_apm`, multi-token context is reduced
    to a single mixed token first (attention.py:596-620)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    use_apm: bool = False

    @nn.compact
    def __call__(self, x, context=None, *, pre=None, post=None,
                 pre_split=False):
        """`pre`/`post`/`pre_split` are layout adapters forwarded to BOTH
        attentions — valid only when they are self-attentions over the same
        folded axis (the temporal-over-T use: TransformerTemporal runs the
        block in spatial-major layout and transposes just q/k/v/o)."""
        if self.use_apm and context is not None:
            context = APMContextMixer(name="apm")(context)
        c = x.shape[-1]
        s1, b1 = _ln_params(self, "norm1", c)
        h = layer_norm(x, s1, b1)
        x = x + CrossAttention(
            self.heads, self.dim_head,
            context_dim=self.context_dim if self.disable_self_attn else None,
            name="attn1",
        )(h, context if self.disable_self_attn else None,
          pre=pre, post=post, pre_split=pre_split)
        s2, b2 = _ln_params(self, "norm2", c)
        h = layer_norm(x, s2, b2)
        x = x + CrossAttention(
            self.heads, self.dim_head, context_dim=self.context_dim, name="attn2"
        )(h, context, pre=pre, post=post, pre_split=pre_split)
        s3, b3 = _ln_params(self, "norm3", c)
        x = FeedForward(c, name="ff")(x, ln=(s3, b3), residual=True)
        return x


class VideoTransformerBlock(nn.Module):
    """Temporal transformer block (video_attention.py:23-171).

    ff_in (pre-FF) -> temporal self-attn -> cross-attn to time context ->
    FF, residuals throughout (is_res: inner_dim == dim always here).

    Layout: input is SPATIAL-major (B*T, S, C) with `batch`/`frames` call
    args giving the (B, T) split.  The LN/FF/projection chain is position-
    independent, so it runs in the channel-minor spatial layout (dense
    fusions); only the T-axis self-attention transposes q/k/v/o to
    time-major — the reference instead rearranges the whole activation
    (b t) s c -> (b s) t c around the block (video_attention.py:100-168),
    which on TPU left every fusion in a strided layout at ~half HBM
    bandwidth (docs/PERF.md)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    ff_in: bool = True
    disable_temporal_crossattention: bool = False

    @nn.compact
    def __call__(self, x, context=None, *, batch: int, frames: int):
        c = x.shape[-1]
        b, t, s = batch, frames, x.shape[1]

        hd, dh = self.heads, self.dim_head

        def to_time_split(z):
            # (b t) s (h d) -> (b s h) t d: ONE permutation that both moves
            # T inner and folds heads into batch, replacing the former
            # time-major transpose + `attention`'s head-split transpose
            # (two full HBM passes per q/k/v/o tensor, docs/PERF.md).
            return z.reshape(b, t, s, hd, dh).transpose(0, 2, 3, 1, 4).reshape(
                b * s * hd, t, dh)

        def from_time_split(z):
            return z.reshape(b, s, hd, t, dh).transpose(0, 3, 1, 2, 4).reshape(
                b * t, s, hd * dh)

        if self.ff_in:
            si, bi = _ln_params(self, "norm_in", c)
            x = FeedForward(c, name="ff_in")(x, ln=(si, bi), residual=True)
        s1, b1 = _ln_params(self, "norm1", c)
        x = x + CrossAttention(self.heads, self.dim_head, name="attn1")(
            layer_norm(x, s1, b1), pre=to_time_split, post=from_time_split,
            pre_split=True,
        )
        if not self.disable_temporal_crossattention:
            s2, b2 = _ln_params(self, "norm2", c)
            # context rows depend only on B; attending S tokens per (b, t)
            # row to the same kv set is identical math to the reference's
            # (b s) t layout (softmax is per-query).
            x = x + CrossAttention(
                self.heads, self.dim_head, context_dim=self.context_dim, name="attn2"
            )(layer_norm(x, s2, b2), context)
        s3, b3 = _ln_params(self, "norm3", c)
        x = FeedForward(c, name="ff")(x, ln=(s3, b3), residual=True)
        return x


def blend_with_images(mix_factor, spatial, temporal, image_only_indicator):
    """UNet AlphaBlender (util.py:312-370): alpha weights the SPATIAL
    branch; image rows take alpha=1.  image_only_indicator: (B, T) bool;
    spatial/temporal: (B, T, ..., C)."""
    alpha = jax.nn.sigmoid(mix_factor.astype(jnp.float32))
    alpha = jnp.where(image_only_indicator, 1.0, alpha)
    alpha = alpha.reshape(alpha.shape + (1,) * (spatial.ndim - alpha.ndim)).astype(spatial.dtype)
    return alpha * spatial + (1.0 - alpha) * temporal


class SpatialVideoTransformer(nn.Module):
    """Spatial transformer + parallel temporal stack per depth
    (video_attention.py:174-333).

    Input (B, T, H, W, C); context (B, T, L, D) CLIP tokens.  The temporal
    blocks' cross-attention context is frame 0's context row, shared across
    spatial positions (use_spatial_context, video_attention.py:275-283).
    """

    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_apm: bool = False
    disable_temporal_crossattention: bool = False
    max_time_embed_period: float = 10000.0

    @nn.compact
    def __call__(self, x, context, image_only_indicator):
        b, t, hh, ww, c = x.shape
        s = hh * ww
        inner = self.heads * self.dim_head
        x_in = x

        gs, gb = _gn_params(self, "norm", c)
        # per-FRAME GroupNorm statistics: the reference normalizes the
        # (B*T, C, H, W) view (attention.py:789), not across frames
        h = group_norm(x.reshape(b * t, hh, ww, c), gs, gb, eps=1e-6)
        h = nn.Dense(inner, name="proj_in")(h).reshape(b, t, hh, ww, inner)

        # frame-index positional embedding for the temporal branch
        frame_ids = jnp.arange(t, dtype=jnp.float32)
        t_emb = timestep_embedding(frame_ids, c, max_period=self.max_time_embed_period)
        pos = nn.Dense(c * 4, name="time_pos_embed_0")(t_emb)
        pos = nn.Dense(c, name="time_pos_embed_2")(jax.nn.silu(pos))
        pos = pos.astype(h.dtype)  # (T, C)

        ctx_sp = context.reshape((b * t,) + context.shape[2:]) if context is not None else None
        ctx_time = context[:, 0] if context is not None else None  # (B, L, D)

        mix = self.param("time_mixer_mix_factor", nn.initializers.constant(0.0), (1,))

        h = h.reshape(b * t, s, inner)
        h = shard(h, "batch", "tokens", None)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, context_dim=self.context_dim,
                use_apm=self.use_apm, name=f"block_{d}",
            )(h, ctx_sp)
            # temporal branch stays spatial-major; frame pos-embed rows
            # broadcast over the token axis ((b t) rows share a frame).
            h_time_in = h + jnp.tile(pos[:, None, :], (b, 1, 1))
            if ctx_time is not None and not self.disable_temporal_crossattention:
                ctx_rep = jnp.broadcast_to(
                    ctx_time[:, None], (b, t) + ctx_time.shape[1:]
                ).reshape((b * t,) + ctx_time.shape[1:])
            else:
                ctx_rep = None
            h_time = VideoTransformerBlock(
                self.heads, self.dim_head, context_dim=self.context_dim,
                ff_in=True,
                disable_temporal_crossattention=self.disable_temporal_crossattention,
                name=f"time_block_{d}",
            )(h_time_in, ctx_rep, batch=b, frames=t)
            h = blend_with_images(
                mix, h.reshape(b, t, s, inner), h_time.reshape(b, t, s, inner),
                image_only_indicator,
            ).reshape(b * t, s, inner)
            h = shard(h, "batch", "tokens", None)

        h = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return x_in + h.reshape(b, t, hh, ww, c)


class UNetResBlock(nn.Module):
    """openaimodel ResBlock, spatial (dims=2): GN(1e-5)+SiLU+conv,
    +emb, GN+SiLU+zero-conv, 1x1 skip (openaimodel.py:210-356).
    Input (N, H, W, C), emb (N, D)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        c = x.shape[-1]
        s1, b1 = _gn_params(self, "in_norm", c)
        h = group_norm(x, s1, b1, eps=1e-5, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), name="in_conv")(h)
        e = nn.Dense(self.out_channels, name="emb_proj")(jax.nn.silu(emb.astype(jnp.float32)).astype(emb.dtype))
        h = h + e[:, None, None, :]
        s2, b2 = _gn_params(self, "out_norm", self.out_channels)
        h = group_norm(h, s2, b2, eps=1e-5, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        return x + h


class _ConvParams(nn.Module):
    """nn.Conv-shaped param pair (kernel/bias) without binding the conv,
    so the temporal conv can route through the Pallas kernel while the
    param tree stays identical to nn.Conv's (checkpoint compatibility)."""

    shape: Tuple[int, ...]
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        k = self.param("kernel", init, self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


def _time_conv(h, kernel, out_channels: int, name: str,
               *, zero_init: bool = False, res=None, res_w=None, gn=None):
    """(kt,1,1) temporal conv with nn.Conv-compatible params.

    On TPU the pure time-axis shape routes through the Pallas kernel
    (ops/temporal_conv.py): XLA's conv lowering pays im2col traffic plus
    ~3 operand layout copies per instance (measured 6.4 ms vs the kernel's
    5.1 ms at level 0, docs/PERF.md).  The param tree is identical to
    nn.Conv's (`{name}/kernel` (kt,1,1,C,Co), `{name}/bias`), so
    checkpoints and the CPU/golden path are unaffected.  A (kt,1,1) conv
    as kt shifted XLA matmuls was 3.5x slower still (26.7 ms) — the
    shifted-output concats never fuse."""
    kt, kh, kw = kernel
    b, t, hh, ww, c = h.shape
    use_pallas = (
        jax.default_backend() == "tpu"
        and kh == 1 and kw == 1 and kt % 2 == 1
        and hh * ww >= 64
        and os.environ.get("STREAMINGT2V_NO_PALLAS") != "1"
    )
    if use_pallas:
        from streamingt2v_tpu.ops.temporal_conv import (
            fits_temporal_conv,
            temporal_conv,
        )
        use_pallas = fits_temporal_conv(t, c, out_channels, kt)
    if not use_pallas:
        if gn is not None:
            h = group_norm(h, gn[0], gn[1], num_groups=gn[2] if len(gn) > 2
                           else 32, eps=1e-5, act="silu")
        ki = {"kernel_init": nn.initializers.zeros} if zero_init else {}
        out = nn.Conv(out_channels, kernel, name=name, **ki)(h)
        if res is not None:
            out = res + res_w[:, :, None, None, None].astype(res.dtype) * out
        return out

    w, bias = _ConvParams((kt, 1, 1, c, out_channels), zero_init=zero_init,
                          name=name)()
    if gn is not None:
        # GN+SiLU fused into the conv's input read: GN is a per-(row,
        # channel) affine once its stats are known (ops/norms.py)
        from streamingt2v_tpu.ops.norms import group_norm_affine

        pa, pb = group_norm_affine(h, gn[0], gn[1],
                                   num_groups=gn[2] if len(gn) > 2 else 32,
                                   eps=1e-5)
    else:
        pa = pb = None
    out = temporal_conv(
        h.reshape(b, t, hh * ww, c),
        w.reshape(kt, c, out_channels).astype(h.dtype),
        bias.astype(jnp.float32),
        None if res is None else res.reshape(b, t, hh * ww, out_channels),
        res_w,
        pa, pb,
    )
    return out.reshape(b, t, hh, ww, out_channels)


class TemporalUNetResBlock(nn.Module):
    """openaimodel ResBlock with dims=3, kernel (3,1,1) (the UNet
    VideoResBlock time_stack, video_model.py:46-59).
    Input (B, T, H, W, C), emb (B, T, D)."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x, emb, blend_weight=None):
        """`blend_weight` ((B, T) f32): when given, returns
        x + blend_weight * out_conv(...) with the scaled residual fused
        into the temporal-conv epilogue — the caller's AlphaBlender
        collapses to this form (see UNetVideoResBlock)."""
        c = x.shape[-1]
        s1, b1 = _gn_params(self, "in_norm", c)
        h = _time_conv(x, self.kernel, self.out_channels, "in_conv",
                       gn=(s1, b1))
        e = nn.Dense(self.out_channels, name="emb_proj")(jax.nn.silu(emb.astype(jnp.float32)).astype(emb.dtype))
        h = h + e[:, :, None, None, :]
        s2, b2 = _gn_params(self, "out_norm", self.out_channels)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        if blend_weight is None:
            blend_weight = jnp.ones(x.shape[:2], jnp.float32)
        return _time_conv(h, self.kernel, self.out_channels, "out_conv",
                          zero_init=True, res=x, res_w=blend_weight,
                          gn=(s2, b2))


class UNetVideoResBlock(nn.Module):
    """Spatial ResBlock + temporal ResBlock, AlphaBlended
    (video_model.py:16-85).  Input (B, T, H, W, C), emb (B, T, D)."""

    out_channels: int
    video_kernel_size: Tuple[int, int, int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x, emb, image_only_indicator):
        b, t, hh, ww, c = x.shape
        h = UNetResBlock(self.out_channels, name="spatial")(
            x.reshape(b * t, hh, ww, c), emb.reshape(b * t, -1)
        ).reshape(b, t, hh, ww, self.out_channels)
        mix = self.param("time_mixer_mix_factor", nn.initializers.constant(0.0), (1,))
        # AlphaBlender algebra: alpha*h + (1-alpha)*(h + conv) =
        # h + (1-alpha)*conv, with alpha forced to 1 (weight 0) for image
        # rows — so the blend + the temporal ResBlock residual collapse
        # into one scaled-residual fused into the out_conv epilogue.
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))
        bw = jnp.where(image_only_indicator, 0.0,
                       (1.0 - alpha).astype(jnp.float32))
        out = TemporalUNetResBlock(
            self.out_channels, self.video_kernel_size, name="time_stack"
        )(h, emb, blend_weight=bw)
        return shard(out, "batch", None, "height", None, None)


class Downsample(nn.Module):
    """Strided conv, symmetric padding (openaimodel.py:161-207).
    Input (N, H, W, C)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (openaimodel.py:107-160). Input (N, H, W, C)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.out_channels, (3, 3), name="conv")(x)
