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

from streamingt2v_tpu.ops import group_norm
from streamingt2v_tpu.ops.attention import attention_pre_split
from streamingt2v_tpu.parallel.sharding import shard


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

        # Projections are position-independent, so they run in the natural
        # frame-major layout; only q/k/v/o get ONE permutation each that
        # both moves F inner and folds heads into batch ((b f) s (h d) ->
        # (b s h) f d) — the former pre-projection (B,F,H,W,C)->(B*H*W,F,C)
        # transposes plus `attention`'s head split cost 7 full HBM passes
        # per merger (docs/PERF.md).
        s, d = h * w, self.attention_head_dim

        def fold(z, fz):
            # staged constraints so GSPMD moves the (tokens, heads) shard
            # through the reshape/transpose chain instead of falling back
            # to "involuntary full rematerialization" (replicate +
            # repartition) at the fold boundaries
            z = shard(z.reshape(b, fz, s, heads, d),
                      "batch", None, "tokens", "heads", None)
            z = shard(z.transpose(0, 2, 3, 1, 4),
                      "batch", "tokens", "heads", None, None)
            return z.reshape(b * s * heads, fz, d)

        hn = nn.Dense(c, name="proj_in")(hn.reshape(b, f, s, c))
        kv = conditioning.reshape(b, f_cond, s, c)

        q = fold(nn.Dense(c, use_bias=False, name="to_q")(hn), f)
        k = fold(nn.Dense(c, use_bias=False, name="to_k")(kv), f_cond)
        v = fold(nn.Dense(c, use_bias=False, name="to_v")(kv), f_cond)
        o = attention_pre_split(q, k, v)
        # (b s h) f d -> (b, f, s, c), constraint-staged like `fold` above
        o = shard(o.reshape(b, s, heads, f, d),
                  "batch", "tokens", "heads", None, None)
        o = shard(o.transpose(0, 3, 1, 2, 4),
                  "batch", None, "tokens", "heads", None)
        o = shard(o.reshape(b, f, s, c), "batch", None, "tokens", ("heads",))
        o = nn.Dense(c, name="to_out")(o)

        residual = nn.Dense(
            c, kernel_init=nn.initializers.zeros, name="proj_out"
        )(o)
        return sample + residual.reshape(b, f, h, w, c)
