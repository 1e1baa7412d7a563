"""ControlNet — the CAM encoder branch.

Rebuild of reference models/control/controlnet.py:12-554: a copy of the
VideoUNet encoder + mid (no decoder), fed only the conditional frames,
with a 4-conv pixel-space conditioning embedder whose output is added to
the latent stream after input block 0 (`Merger`, merge_mode 'addition',
frame_expansion 'none').  Returns every encoder skip activation plus the
mid activation — the CAM features fused into the base UNet.

Config (reference config.yaml:43-66): conditioning_embedding_out_channels
(32, 96, 256, 512), downsample_controlnet_cond=True (pixel-space 3-channel
input, 3 stride-2 convs -> the 8x latent grid), LayerNorm between convs
(use_image_encoder_normalization), zero-init conv_out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
from streamingt2v_tpu.models.unet_blocks import (
    Downsample,
    SpatialVideoTransformer,
    UNetVideoResBlock,
    _ln_params,
)
from streamingt2v_tpu.ops import layer_norm, timestep_embedding


class ControlNetConditioningEmbedding(nn.Module):
    """Pixel-space control-frame encoder (controlnet.py:51-121).
    Input (N, H, W, 3) -> (N, H/8, W/8, embed_channels)."""

    embed_channels: int
    block_out_channels: Tuple[int, ...] = (32, 96, 256, 512)
    downsample: bool = True
    use_normalization: bool = True

    @nn.compact
    def __call__(self, x):
        h = jax.nn.silu(nn.Conv(self.block_out_channels[0], (3, 3), name="conv_in")(x))
        stride = 2 if self.downsample else 1
        k = 0
        for i in range(len(self.block_out_channels) - 1):
            c_in = self.block_out_channels[i]
            c_out = self.block_out_channels[i + 1]
            h = nn.Conv(c_in, (3, 3), name=f"block_{2*i}")(h)
            if self.use_normalization:
                s, b = _ln_params(self, f"norm_{k}", c_in)
                h = layer_norm(h, s, b)
                k += 1
            h = jax.nn.silu(h)
            # torch uses symmetric padding=1 on the strided convs; flax SAME
            # would pad (0,1) and shift the grid
            h = nn.Conv(c_out, (3, 3), strides=(stride, stride), padding=1,
                        name=f"block_{2*i+1}")(h)
            if self.use_normalization:
                s, b = _ln_params(self, f"norm_{k}", c_out)
                h = layer_norm(h, s, b)
                k += 1
            h = jax.nn.silu(h)
        return nn.Conv(self.embed_channels, (3, 3),
                       kernel_init=nn.initializers.zeros, name="conv_out")(h)


class ControlNet(nn.Module):
    """Encoder+mid copy of the VideoUNet run on the F_cond conditional
    frames.  `unet_cfg` must be the base UNet's config (from_unet,
    controlnet.py:556-614)."""

    unet_cfg: VideoUNetConfig
    cfg: ControlNetConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,              # (B, F_cond, h, w, C_in) latents+concat
        t_cont: jax.Array,         # (B,)
        context: Optional[jax.Array],   # (B, F_cond, 1, 1024)
        y: Optional[jax.Array],         # (B, F_cond, 768)
        controlnet_cond: jax.Array,     # (B, F_cond, H, W, 3) pixel frames
        image_only_indicator: Optional[jax.Array] = None,
    ):
        ucfg = self.unet_cfg
        b, t = x.shape[:2]
        dtype = ucfg.dtypes.compute_dtype
        x = x.astype(dtype)
        if image_only_indicator is None:
            image_only_indicator = jnp.zeros((b, t), dtype=bool)

        emb_dim = ucfg.model_channels * 4
        t_emb = timestep_embedding(t_cont, ucfg.model_channels, max_period=ucfg.max_period)
        emb = nn.Dense(emb_dim, name="time_embed_0")(t_emb.astype(dtype))
        emb = nn.Dense(emb_dim, name="time_embed_2")(jax.nn.silu(emb))
        emb = jnp.broadcast_to(emb[:, None, :], (b, t, emb_dim))
        if y is not None:
            le = nn.Dense(emb_dim, name="label_emb_0")(y.astype(dtype))
            le = nn.Dense(emb_dim, name="label_emb_2")(jax.nn.silu(le))
            emb = emb + le
        if context is not None:
            context = context.astype(dtype)

        def spatial(h, fn):
            bb, tt = h.shape[:2]
            out = fn(h.reshape((bb * tt,) + h.shape[2:]))
            return out.reshape((bb, tt) + out.shape[1:])

        # remat mirrors the base UNet's use_checkpoint flag
        res_cls = (
            nn.remat(UNetVideoResBlock) if ucfg.use_checkpoint else UNetVideoResBlock
        )
        attn_cls = (
            nn.remat(SpatialVideoTransformer) if ucfg.use_checkpoint
            else SpatialVideoTransformer
        )

        # controlnet_cond may carry FEWER batch rows than x (the streaming
        # wrapper passes one copy when the CFG halves share identical ctrl
        # frames — the embedder is context-free, so computing it per-half
        # is pure waste); broadcast the embedding up to x's batch.
        cond_embed = spatial(
            controlnet_cond.astype(dtype),
            ControlNetConditioningEmbedding(
                embed_channels=ucfg.model_channels,
                block_out_channels=self.cfg.conditioning_embedding_out_channels,
                downsample=self.cfg.downsample_controlnet_cond,
                use_normalization=self.cfg.use_image_encoder_normalization,
                name="cond_embedding",
            ),
        )
        if cond_embed.shape[0] != b:
            assert b % cond_embed.shape[0] == 0, (b, cond_embed.shape)
            cond_embed = jnp.tile(
                cond_embed,
                (b // cond_embed.shape[0],) + (1,) * (cond_embed.ndim - 1),
            )

        hs = []
        h = spatial(x, nn.Conv(ucfg.model_channels, (3, 3), name="in_conv"))
        h = h + cond_embed  # Merger, merge_mode='addition' (controlnet.py:12-48)
        hs.append(h)
        ch = ucfg.model_channels
        ds = 1
        blk = 0
        for level, mult in enumerate(ucfg.channel_mult):
            for _ in range(ucfg.num_res_blocks):
                ch = mult * ucfg.model_channels
                h = res_cls(ch, ucfg.video_kernel_size, name=f"input_{blk}_res")(
                    h, emb, image_only_indicator
                )
                if ds in ucfg.attention_resolutions:
                    heads = ch // ucfg.num_head_channels
                    h = attn_cls(
                        heads=heads, dim_head=ucfg.num_head_channels,
                        depth=ucfg.transformer_depth, context_dim=ucfg.context_dim,
                        disable_temporal_crossattention=ucfg.disable_temporal_crossattention,
                        max_time_embed_period=ucfg.max_period,
                        name=f"input_{blk}_attn",
                    )(h, context, image_only_indicator)
                hs.append(h)
                blk += 1
            if level != len(ucfg.channel_mult) - 1:
                ds *= 2
                h = spatial(h, Downsample(ch, name=f"input_{blk}_down"))
                hs.append(h)
                blk += 1

        h = res_cls(ch, ucfg.video_kernel_size, name="middle_res_0")(
            h, emb, image_only_indicator
        )
        heads = ch // ucfg.num_head_channels
        h = attn_cls(
            heads=heads, dim_head=ucfg.num_head_channels,
            depth=ucfg.transformer_depth, context_dim=ucfg.context_dim,
            disable_temporal_crossattention=ucfg.disable_temporal_crossattention,
            max_time_embed_period=ucfg.max_period,
            name="middle_attn",
        )(h, context, image_only_indicator)
        h = res_cls(ch, ucfg.video_kernel_size, name="middle_res_1")(
            h, emb, image_only_indicator
        )
        return tuple(hs), h
