"""VideoUNet — the SVD spatio-temporal UNet with CAM fusion points.

Rebuild of reference models/diffusion/video_model.py:88-618: the SVD-XT
UNet (UNetVideoResBlock + SpatialVideoTransformer per level, sequential
adm conditioning) extended with a `ConditionalModel` merger after every
input block and the mid block when `controlnet_mode`
(video_model.py:134-140,234-237,335-337,371-373,418-420; fusion at
:582-605).

Forward contract (channel-last, batch/time separate):
  x:        (B, T, H, W, C_in)   latent + concat conditioning channels
  t_cont:   (B,)                 continuous noise conditioning (c_noise)
  context:  (B, T, L, 1024)      CLIP image tokens
  y:        (B, T, 768)          vector conditioning (fps/motion/aug)
  image_only_indicator: (B, T) bool
  hs_control / h_control_mid: CAM features per input block / mid block.

The reference's memory workarounds (chunked feed-forward, xformers batch
splitting — video_model.py:498-537) are intentionally absent: memory
scaling comes from flash attention, remat and mesh sharding instead.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.config import VideoUNetConfig
from streamingt2v_tpu.models.cam import CAMConditionalModel
from streamingt2v_tpu.models.unet_blocks import (
    Downsample,
    SpatialVideoTransformer,
    UNetVideoResBlock,
    Upsample,
    _gn_params,
)
from streamingt2v_tpu.ops import group_norm, timestep_embedding


def unet_level_layout(cfg: VideoUNetConfig) -> List[dict]:
    """Static per-input-block layout: channels and whether it has attention.
    Mirrors the construction loop of video_model.py:297-380."""
    blocks = [dict(kind="conv_in", ch=cfg.model_channels, attn=False, ds=1)]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            blocks.append(dict(kind="res", ch=ch, attn=ds in cfg.attention_resolutions, ds=ds))
        if level != len(cfg.channel_mult) - 1:
            ds *= 2
            blocks.append(dict(kind="down", ch=ch, attn=False, ds=ds))
    return blocks


class VideoUNet(nn.Module):
    cfg: VideoUNetConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t_cont: jax.Array,
        context: Optional[jax.Array],
        y: Optional[jax.Array],
        image_only_indicator: Optional[jax.Array] = None,
        hs_control: Optional[Sequence[jax.Array]] = None,
        h_control_mid: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        b, t = x.shape[:2]
        dtype = cfg.dtypes.compute_dtype
        x = x.astype(dtype)
        if image_only_indicator is None:
            image_only_indicator = jnp.zeros((b, t), dtype=bool)

        # ---- embeddings ----
        emb_dim = cfg.model_channels * 4
        t_emb = timestep_embedding(t_cont, cfg.model_channels, max_period=cfg.max_period)
        emb = nn.Dense(emb_dim, name="time_embed_0")(t_emb.astype(dtype))
        emb = nn.Dense(emb_dim, name="time_embed_2")(jax.nn.silu(emb))
        emb = jnp.broadcast_to(emb[:, None, :], (b, t, emb_dim))
        if y is not None:
            le = nn.Dense(emb_dim, name="label_emb_0")(y.astype(dtype))
            le = nn.Dense(emb_dim, name="label_emb_2")(jax.nn.silu(le))
            emb = emb + le
        if context is not None:
            context = context.astype(dtype)

        # use_checkpoint: rematerialize block activations in the backward
        # pass (the TPU replacement for the reference's `use_checkpoint`
        # torch.utils.checkpoint flags, config.yaml:89 / openaimodel).
        res_cls = nn.remat(UNetVideoResBlock) if cfg.use_checkpoint else UNetVideoResBlock
        attn_cls = (
            nn.remat(SpatialVideoTransformer) if cfg.use_checkpoint
            else SpatialVideoTransformer
        )

        def res(ch, name):
            return res_cls(ch, cfg.video_kernel_size, name=name)

        def attn(ch, name):
            heads = ch // cfg.num_head_channels
            return attn_cls(
                heads=heads,
                dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth,
                context_dim=cfg.context_dim,
                use_apm=cfg.use_apm,
                disable_temporal_crossattention=cfg.disable_temporal_crossattention,
                max_time_embed_period=cfg.max_period,
                name=name,
            )

        def spatial(h, fn):
            bb, tt = h.shape[:2]
            out = fn(h.reshape((bb * tt,) + h.shape[2:]))
            return out.reshape((bb, tt) + out.shape[1:])

        # ---- input blocks ----
        hs = []
        h = spatial(x, nn.Conv(cfg.model_channels, (3, 3), name="in_conv"))
        hs.append(h)
        ch = cfg.model_channels
        ds = 1
        blk = 0
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = res(ch, f"input_{blk}_res")(h, emb, image_only_indicator)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"input_{blk}_attn")(h, context, image_only_indicator)
                hs.append(h)
                blk += 1
            if level != len(cfg.channel_mult) - 1:
                ds *= 2
                h = spatial(h, Downsample(ch, name=f"input_{blk}_down"))
                hs.append(h)
                blk += 1

        # ---- CAM fusion on input skips (video_model.py:582-591) ----
        if cfg.controlnet_mode:
            new_hs = []
            for i, h_skip in enumerate(hs):
                merger = CAMConditionalModel(
                    attention_head_dim=min(64, h_skip.shape[-1]),
                    name=f"cam_merger_input_{i}",
                )
                if hs_control is not None:
                    h_skip = merger(h_skip, hs_control[i])
                else:
                    # materialize params even when unconditioned (first chunk)
                    h_skip = merger(h_skip, h_skip[:, :1])
                new_hs.append(h_skip)
            if hs_control is not None:
                hs = new_hs

        # ---- middle ----
        h = res(ch, "middle_res_0")(h, emb, image_only_indicator)
        h = attn(ch, "middle_attn")(h, context, image_only_indicator)
        h = res(ch, "middle_res_1")(h, emb, image_only_indicator)

        if cfg.controlnet_mode:
            merger = CAMConditionalModel(
                attention_head_dim=min(64, h.shape[-1]), name="cam_merger_mid"
            )
            if h_control_mid is not None:
                h = merger(h, h_control_mid)
            else:
                merger(h, h[:, :1])

        # ---- output blocks ----
        # skip channel bookkeeping mirrors input_block_chans (video_model.py:423-489)
        blk = 0
        ds_out = ds
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                h_skip = hs.pop()
                h = jnp.concatenate([h, h_skip], axis=-1)
                ch = cfg.model_channels * mult
                h = res(ch, f"output_{blk}_res")(h, emb, image_only_indicator)
                if ds_out in cfg.attention_resolutions:
                    h = attn(ch, f"output_{blk}_attn")(h, context, image_only_indicator)
                if level and i == cfg.num_res_blocks:
                    ds_out //= 2
                    h = spatial(h, Upsample(ch, name=f"output_{blk}_up"))
                blk += 1

        # ---- out head ----
        # per-FRAME GroupNorm statistics: the reference normalizes the
        # (B*T, C, H, W) view (openaimodel `out`), not across frames —
        # caught by the full-model golden (tests/test_composition_goldens.py)
        s, bias = _gn_params(self, "out_norm", h.shape[-1])
        h = spatial(h, lambda hf: group_norm(hf, s, bias, eps=1e-5, act="silu"))
        h = spatial(h, nn.Conv(cfg.out_channels, (3, 3),
                               kernel_init=nn.initializers.zeros, name="out_conv"))
        return h.astype(jnp.float32)
