"""I2VGen-XL UNet — the stage-2 enhancement model.

TPU rebuild of the reference's vendored diffusers I2VGenXLUNet
(reference i2v_enhance/unet_i2vgen_xl.py:159-814) and its 3D blocks
(i2v_enhance/unet_3d_blocks.py): per layer resnet -> temporal conv ->
spatial transformer -> temporal transformer; context = text tokens ‖
first-frame VAE-latent context tokens ‖ projected CLIP image embedding;
image latents additionally enter channel-concatenated after a per-pixel
temporal encoder (unet_i2vgen_xl.py:690-704).

Layout: (B, T, H, W, C) channel-last; spatial modules fold T, temporal
modules fold (H W).  The reference's `use_memopt` chunked block execution
(unet_i2vgen_xl.py:51-106) is replaced by remat/sharding upstream.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import DTypePolicy
from streamingt2v_tpu.models.unet_blocks import BasicTransformerBlock, _gn_params, _ln_params
from streamingt2v_tpu.ops import attention, group_norm, layer_norm, timestep_embedding


@dataclasses.dataclass(frozen=True)
class I2VGenXLUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    dtypes: DTypePolicy = dataclasses.field(default_factory=DTypePolicy)

    @classmethod
    def tiny(cls) -> "I2VGenXLUNetConfig":
        return cls(
            block_out_channels=(16, 32),
            layers_per_block=1,
            norm_num_groups=8,
            cross_attention_dim=32,
            attention_head_dim=8,
            dtypes=DTypePolicy.fp32(),
        )


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D: GN(1e-5)+SiLU+conv, +temb, GN+SiLU+conv,
    1x1 shortcut.  Input (N, H, W, C), temb (N, D)."""

    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        c = x.shape[-1]
        s1, b1 = _gn_params(self, "norm1", c)
        h = group_norm(x, s1, b1, num_groups=self.groups, eps=1e-5, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(h)
        e = nn.Dense(self.out_channels, name="time_emb_proj")(
            jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)
        )
        h = h + e[:, None, None, :]
        s2, b2 = _gn_params(self, "norm2", self.out_channels)
        h = group_norm(h, s2, b2, num_groups=self.groups, eps=1e-5, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class TemporalConvLayer(nn.Module):
    """diffusers TemporalConvLayer: 4x (GN+SiLU+conv3d(3,1,1)), conv4
    zero-init, residual.  Input (B, T, H, W, C)."""

    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        from streamingt2v_tpu.models.unet_blocks import _time_conv

        c = x.shape[-1]
        identity = x
        specs = [
            ("conv1", c, self.out_channels),
            ("conv2", self.out_channels, c),
            ("conv3", c, c),
            ("conv4", c, c),
        ]
        h = x
        for i, (name, c_in, c_out) in enumerate(specs):
            s, b = _gn_params(self, f"{name}_norm", h.shape[-1])
            # GN+SiLU fused into the Pallas temporal conv's input read on
            # TPU; last conv carries the fused residual epilogue
            last = i == len(specs) - 1
            h = _time_conv(
                h, (3, 1, 1), c_out, name, zero_init=last,
                gn=(s, b, self.groups),
                res=identity if last else None,
                res_w=jnp.ones(x.shape[:2], jnp.float32) if last else None,
            )
        return h


class Transformer2D(nn.Module):
    """diffusers Transformer2DModel (conv projections): GN(1e-6) ->
    1x1 conv in -> BasicTransformerBlock -> 1x1 conv out, residual.
    Input (N, H, W, C), context (N, L, D)."""

    heads: int
    dim_head: int
    context_dim: int
    groups: int = 32
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        n, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        s, b = _gn_params(self, "norm", c)
        h = group_norm(x, s, b, num_groups=self.groups, eps=1e-6)
        h = nn.Conv(inner, (1, 1), name="proj_in")(h).reshape(n, hh * ww, inner)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, context_dim=self.context_dim, name=f"block_{d}"
            )(h, context)
        h = nn.Conv(c, (1, 1), name="proj_out")(h.reshape(n, hh, ww, inner))
        return x_in + h


class TransformerTemporal(nn.Module):
    """diffusers TransformerTemporalModel: GN(1e-6, stats over (T,H,W)) ->
    linear in -> temporal BasicTransformerBlock (double self-attention) ->
    linear out, residual.  Input (B, T, H, W, C)."""

    heads: int
    dim_head: int
    groups: int = 32
    depth: int = 1

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        s, bias = _gn_params(self, "norm", c)
        h = group_norm(x, s, bias, num_groups=self.groups, eps=1e-6)
        # Spatial-major layout: the reference rearranges the whole
        # activation b t h w c -> (b h w) t c around the block
        # (diffusers TransformerTemporalModel) — two full HBM permutations
        # plus head-split transposes inside each attention.  LN/FF/Dense
        # are position-independent, so the block runs in (b t, hw, c) and
        # only q/k/v/o transpose around the T-axis self-attentions, in ONE
        # permutation that also folds heads (same redesign as the stage-1
        # VideoTransformerBlock, docs/PERF.md).
        sdim = hh * ww
        hd, dh = self.heads, self.dim_head
        h = h.reshape(b * t, sdim, c)
        h = nn.Dense(inner, name="proj_in")(h)

        def to_time(z):
            return z.reshape(b, t, sdim, hd, dh).transpose(0, 2, 3, 1, 4).reshape(
                b * sdim * hd, t, dh)

        def from_time(z):
            return z.reshape(b, sdim, hd, t, dh).transpose(0, 3, 1, 2, 4).reshape(
                b * t, sdim, hd * dh)

        for d in range(self.depth):
            # attn2 is a second self-attention (double_self_attention)
            h = BasicTransformerBlock(self.heads, self.dim_head, context_dim=None,
                                      name=f"block_{d}")(
                h, None, pre=to_time, post=from_time, pre_split=True)
        h = nn.Dense(c, name="proj_out")(h)
        h = h.reshape(b, t, hh, ww, c)
        return x_in + h


class TemporalEncoder(nn.Module):
    """I2VGenXLTransformerTemporalEncoder (unet_i2vgen_xl.py:110-156):
    LN -> self-attn (no q/k/v bias, out bias) -> plain-GELU FF, residuals.
    Input (N, T, C)."""

    heads: int
    dim_head: int
    ff_inner: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s1, b1 = _ln_params(self, "norm1", c)
        h = layer_norm(x, s1, b1)
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)
        o = attention(q, k, v, num_heads=self.heads)
        x = x + nn.Dense(c, name="to_out")(o)
        h = nn.Dense(self.ff_inner, name="ff_fc")(x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        return x + nn.Dense(c, name="ff_out")(h)


def adaptive_avg_pool_matrices(in_size: int, out_size: int) -> np.ndarray:
    """Row-averaging matrix implementing torch AdaptiveAvgPool1d semantics:
    window i spans [floor(i*I/O), ceil((i+1)*I/O))."""
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool_2d(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(N, H, W, C) -> (N, oh, ow, C) via two averaging matmuls (MXU)."""
    n, h, w, c = x.shape
    ph = jnp.asarray(adaptive_avg_pool_matrices(h, out_hw[0]), x.dtype)
    pw = jnp.asarray(adaptive_avg_pool_matrices(w, out_hw[1]), x.dtype)
    out = jnp.einsum("oh,nhwc->nowc", ph, x)
    return jnp.einsum("pw,nowc->nopc", pw, out)


class I2VGenXLUNet(nn.Module):
    cfg: I2VGenXLUNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,            # (B, T, h, w, 4) noisy latents
        timestep: jax.Array,          # (B,) discrete timesteps
        fps: jax.Array,               # (B,)
        image_latents: jax.Array,     # (B, T, h, w, 4)
        image_embeddings: jax.Array,  # (B, 1024) CLIP image embedding
        encoder_hidden_states: jax.Array,  # (B, L, 1024) text tokens
    ) -> jax.Array:
        cfg = self.cfg
        b, t, hh, ww, _ = sample.shape
        dtype = cfg.dtypes.compute_dtype
        sample = sample.astype(dtype)
        image_latents = image_latents.astype(dtype)
        image_embeddings = image_embeddings.astype(dtype)
        encoder_hidden_states = encoder_hidden_states.astype(dtype)
        ch0 = cfg.block_out_channels[0]
        emb_dim = ch0 * 4
        groups = cfg.norm_num_groups

        def spatial(h, fn):
            bb, tt = h.shape[:2]
            out = fn(h.reshape((bb * tt,) + h.shape[2:]))
            return out.reshape((bb, tt) + out.shape[1:])

        # 1-3. time + fps embeddings (flip_sin_to_cos=True, downscale 0)
        t_emb = timestep_embedding(timestep.astype(jnp.float32), ch0).astype(dtype)
        emb = nn.Dense(emb_dim, name="time_embedding_1")(t_emb)
        emb = nn.Dense(emb_dim, name="time_embedding_2")(jax.nn.silu(emb))
        f_emb = timestep_embedding(fps.astype(jnp.float32), ch0).astype(dtype)
        fe = nn.Dense(emb_dim, name="fps_embedding_1")(f_emb)
        fe = nn.Dense(emb_dim, name="fps_embedding_2")(jax.nn.silu(fe))
        emb = emb + fe  # (B, emb_dim); broadcast over frames at use sites
        emb_bt = jnp.repeat(emb, t, axis=0)  # (B*T, emb_dim)

        # 4. context tokens: text ‖ first-frame latent context ‖ CLIP image
        ctx_parts = [encoder_hidden_states]
        il_first = image_latents[:, 0]  # (B, h, w, 4)
        h_ctx = nn.Conv(cfg.in_channels * 8, (3, 3), name="ilce_conv1")(il_first)
        h_ctx = adaptive_avg_pool_2d(jax.nn.silu(h_ctx), (32, 32))
        h_ctx = nn.Conv(cfg.in_channels * 16, (3, 3), strides=(2, 2), padding=1,
                        name="ilce_conv2")(h_ctx)
        h_ctx = nn.Conv(cfg.cross_attention_dim, (3, 3), strides=(2, 2), padding=1,
                        name="ilce_conv3")(jax.nn.silu(h_ctx))
        ctx_parts.append(h_ctx.reshape(b, -1, cfg.cross_attention_dim))  # 64 tokens
        img_ctx = nn.Dense(emb_dim, name="context_embedding_1")(image_embeddings)
        img_ctx = nn.Dense(cfg.cross_attention_dim * cfg.in_channels,
                           name="context_embedding_2")(jax.nn.silu(img_ctx))
        ctx_parts.append(img_ctx.reshape(b, cfg.in_channels, cfg.cross_attention_dim))
        context = jnp.concatenate(ctx_parts, axis=1)  # (B, L', D)
        context_bt = jnp.repeat(context, t, axis=0)   # (B*T, L', D)

        # image-latent channel stream: 3-conv proj + per-pixel temporal encoder
        il = spatial(image_latents, nn.Conv(cfg.in_channels * 4, (3, 3), name="ilp_conv1"))
        il = spatial(jax.nn.silu(il), nn.Conv(cfg.in_channels * 4, (3, 3), name="ilp_conv2"))
        il = spatial(jax.nn.silu(il), nn.Conv(cfg.in_channels, (3, 3), name="ilp_conv3"))
        il_t = il.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, cfg.in_channels)
        il_t = TemporalEncoder(2, cfg.in_channels, cfg.in_channels * 4,
                               name="image_latents_temporal_encoder")(il_t)
        il = il_t.reshape(b, hh, ww, t, cfg.in_channels).transpose(0, 3, 1, 2, 4)

        # 5. pre-process
        h = jnp.concatenate([sample, il], axis=-1)
        h = spatial(h, nn.Conv(ch0, (3, 3), name="conv_in"))
        h = TransformerTemporal(8, cfg.attention_head_dim, groups=groups,
                                name="transformer_in")(h)

        def res(c_out, name):
            def fn(x5, emb_b):
                bb, tt = x5.shape[:2]
                out = ResnetBlock2D(c_out, groups, name=name)(
                    x5.reshape((bb * tt,) + x5.shape[2:]), emb_b
                )
                return out.reshape((bb, tt) + out.shape[1:])
            return fn

        def attn2d(c_out, name):
            heads = c_out // cfg.attention_head_dim
            def fn(x5, ctx_b):
                bb, tt = x5.shape[:2]
                out = Transformer2D(heads, cfg.attention_head_dim,
                                    cfg.cross_attention_dim, groups, name=name)(
                    x5.reshape((bb * tt,) + x5.shape[2:]), ctx_b
                )
                return out.reshape((bb, tt) + out.shape[1:])
            return fn

        n_blocks = len(cfg.block_out_channels)
        # 6. down
        hs = [h]
        ch = ch0
        for i, c_out in enumerate(cfg.block_out_channels):
            cross = i < n_blocks - 1
            for j in range(cfg.layers_per_block):
                h = res(c_out, f"down_{i}_res_{j}")(h, emb_bt)
                h = TemporalConvLayer(c_out, groups, name=f"down_{i}_tconv_{j}")(h)
                if cross:
                    h = attn2d(c_out, f"down_{i}_attn_{j}")(h, context_bt)
                    h = TransformerTemporal(c_out // cfg.attention_head_dim,
                                            cfg.attention_head_dim, groups,
                                            name=f"down_{i}_tattn_{j}")(h)
                hs.append(h)
                ch = c_out
            if i < n_blocks - 1:
                h = spatial(h, nn.Conv(c_out, (3, 3), strides=(2, 2), padding=1,
                                       name=f"down_{i}_downsample"))
                hs.append(h)

        # 7. mid
        c_mid = cfg.block_out_channels[-1]
        heads_mid = c_mid // cfg.attention_head_dim
        h = res(c_mid, "mid_res_0")(h, emb_bt)
        h = TemporalConvLayer(c_mid, groups, name="mid_tconv_0")(h)
        h = attn2d(c_mid, "mid_attn")(h, context_bt)
        h = TransformerTemporal(heads_mid, cfg.attention_head_dim, groups,
                                name="mid_tattn")(h)
        h = res(c_mid, "mid_res_1")(h, emb_bt)
        h = TemporalConvLayer(c_mid, groups, name="mid_tconv_1")(h)

        # 8. up
        rev = list(reversed(cfg.block_out_channels))
        for i in range(n_blocks):
            c_out = rev[i]
            cross = i > 0
            for j in range(cfg.layers_per_block + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(c_out, f"up_{i}_res_{j}")(h, emb_bt)
                h = TemporalConvLayer(c_out, groups, name=f"up_{i}_tconv_{j}")(h)
                if cross:
                    h = attn2d(c_out, f"up_{i}_attn_{j}")(h, context_bt)
                    h = TransformerTemporal(c_out // cfg.attention_head_dim,
                                            cfg.attention_head_dim, groups,
                                            name=f"up_{i}_tattn_{j}")(h)
            if i < n_blocks - 1:
                # diffusers passes `upsample_size` from the next skip so
                # odd spatial dims round-trip (e.g. 23 -> 12 -> 23 at
                # 720p): F.interpolate(size=skip_hw, mode="nearest")
                # (unet_3d_blocks.py CrossAttnUpBlock3D forward).  For the
                # exact-2x case floor-index nearest == repeat.
                th, tw = hs[-1].shape[2], hs[-1].shape[3]

                def upsample(x2d, c_out=c_out, name=f"up_{i}_upsample",
                             th=th, tw=tw):
                    ih, iw = x2d.shape[1], x2d.shape[2]
                    if (th, tw) == (2 * ih, 2 * iw):
                        x2d = jnp.repeat(jnp.repeat(x2d, 2, axis=1), 2, axis=2)
                    else:
                        x2d = jnp.take(x2d, (jnp.arange(th) * ih) // th, axis=1)
                        x2d = jnp.take(x2d, (jnp.arange(tw) * iw) // tw, axis=2)
                    return nn.Conv(c_out, (3, 3), name=name)(x2d)
                h = spatial(h, upsample)

        # 9. out — PER-FRAME GroupNorm statistics: the reference applies
        # conv_norm_out on the (B*T, C, H, W) stream (unet_i2vgen_xl.py:803),
        # so each frame normalizes with its own stats.  Caught by
        # test_reference_goldens.py (the hand-built replica had encoded the
        # same across-frames misreading as the model).
        s, bias = _gn_params(self, "conv_norm_out", h.shape[-1])
        h = spatial(h, lambda x4: group_norm(x4, s, bias, num_groups=groups,
                                             eps=1e-5, act="silu"))
        h = spatial(h, nn.Conv(cfg.out_channels, (3, 3), name="conv_out"))
        return h.astype(jnp.float32)
