"""CAM fusion: per-pixel temporal cross-attention merging ControlNet
(conditional-attention-module) features into the base UNet's skips.

Rebuild of reference models/cam/conditioning.py:7-146 (`CrossAttention` +
`ConditionalModel`, merging_mode 'attention_cross_attention').

Geometry: query = base-UNet activation as (B*H*W, F, C) — every pixel
attends over frames; key/value = the CAM branch activation over the
F_cond conditional frames at the same pixel.  proj_out is zero-init so
fusion starts as identity.  The reference's dropout(0.25) on
non-conditional frames is train-only; inference is deterministic.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from streamingt2v_tpu.ops import attention, group_norm


class CAMConditionalModel(nn.Module):
    """Fuse `sample` (B, F, H, W, C) with `conditioning` (B, F_cond, H, W, C)."""

    attention_head_dim: int = 64

    @nn.compact
    def __call__(self, sample, conditioning):
        b, f, h, w, c = sample.shape
        f_cond = conditioning.shape[1]
        heads = c // self.attention_head_dim

        # GroupNorm over (F, H, W) per channel group — the reference
        # normalizes the (B, C, F, H, W) view (conditioning.py:58-60).
        scale = self.param("norm_scale", nn.initializers.ones, (c,))
        bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        hn = group_norm(sample, scale, bias, eps=1e-6)

        # (B, F, H, W, C) -> (B*H*W, F, C)
        hn = hn.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        hn = nn.Dense(c, name="proj_in")(hn)

        kv = conditioning.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f_cond, c)

        q = nn.Dense(c, use_bias=False, name="to_q")(hn)
        k = nn.Dense(c, use_bias=False, name="to_k")(kv)
        v = nn.Dense(c, use_bias=False, name="to_v")(kv)
        o = attention(q, k, v, num_heads=heads)
        o = nn.Dense(c, name="to_out")(o)

        residual = nn.Dense(
            c, kernel_init=nn.initializers.zeros, name="proj_out"
        )(o)
        residual = residual.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return sample + residual
