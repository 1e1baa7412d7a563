"""Variational autoencoder: spatial encoder + temporal video decoder.

TPU-native rebuild of the reference VAE stack:
  - sgm `Encoder`/`Decoder` conv towers (reference
    models/svd/sgm/modules/diffusionmodules/model.py:487,604)
  - temporal `VideoDecoder` with per-resblock temporal 3D-conv stacks
    blended by a learned alpha, and a temporal `conv_out`
    (reference modules/autoencoding/temporal_ae.py:16-105,291-347,
    time_mode='conv-only': resblocks+conv_out are temporal, attention
    stays spatial)
  - `AutoencodingEngine` encode/decode with DiagonalGaussian
    regularization (reference models/autoencoder.py:196-210) and the
    KL variant with quant/post-quant convs used by the conditioning
    embedder (reference models/autoencoder.py:437-607).

Layout is channel-last: spatial modules take (N, H, W, C) with frames
folded into N; temporal modules take (B, T, H, W, C).  The VAE runs in
fp32 (`disable_first_stage_autocast`, reference config.yaml:310).

Blend orientation (weights-port critical): the decoder's VideoResBlock
computes `sigmoid(mix) * temporal + (1 - sigmoid(mix)) * spatial`
(temporal_ae.py:74-79) — note this is the OPPOSITE orientation of the
UNet's AlphaBlender.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.config import VAEConfig
from streamingt2v_tpu.ops import attention, group_norm


def _gn_params(module: nn.Module, name: str, c: int):
    scale = module.param(f"{name}_scale", nn.initializers.ones, (c,))
    bias = module.param(f"{name}_bias", nn.initializers.zeros, (c,))
    return scale, bias


class ResnetBlock(nn.Module):
    """sgm ResnetBlock (model.py:94-160): GN(eps 1e-6)+SiLU+conv x2, 1x1
    nin_shortcut on channel change."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        s1, b1 = _gn_params(self, "norm1", c_in)
        h = group_norm(x, s1, b1, eps=1e-6, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(h)
        s2, b2 = _gn_params(self, "norm2", self.out_channels)
        h = group_norm(h, s2, b2, eps=1e-6, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention at the bottleneck (model.py:161-203).
    At 576x1024 inputs this is a 9216-token, 512-dim single-head attention —
    the flash kernel's largest-head-dim geometry."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        s, b = _gn_params(self, "norm", c)
        hn = group_norm(x, s, b, eps=1e-6)
        q = nn.Conv(c, (1, 1), name="q")(hn).reshape(n, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(hn).reshape(n, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(hn).reshape(n, h * w, c)
        o = attention(q, k, v, num_heads=1)
        o = nn.Conv(c, (1, 1), name="proj_out")(o.reshape(n, h, w, c))
        return x + o


class Downsample(nn.Module):
    """Strided conv with the reference's asymmetric (0,1,0,1) pad
    (model.py:250-268)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID", name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x + conv (model.py:228-249)."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(c, (3, 3), name="conv")(x)


class Encoder(nn.Module):
    """Spatial encoder tower. Input (N, H, W, 3) in [-1,1] ->
    (N, H/8, W/8, 2*z) moments when double_z."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, name=f"down_{i}_block_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(name=f"down_{i}_downsample")(h)
        c = h.shape[-1]
        h = ResnetBlock(c, name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(c, name="mid_block_2")(h)
        s, b = _gn_params(self, "norm_out", c)
        h = group_norm(h, s, b, eps=1e-6, act="silu")
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_c, (3, 3), name="conv_out")(h)


class TemporalResStack(nn.Module):
    """The VideoResBlock's `time_stack`: an openaimodel ResBlock with
    dims=3, kernel (3,1,1), skip_t_emb (temporal_ae.py:30-42).
    GN eps 1e-5 (openaimodel `normalization`), zero-init output conv.
    Input (B, T, H, W, C)."""

    kernel: Tuple[int, int, int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x, blend_weight=None):
        """`blend_weight` ((B, T) f32): fused x + bw * out_conv(...) —
        the VAE AlphaBlender collapses onto the temporal-conv epilogue
        exactly like the UNet case (unet_blocks._time_conv)."""
        from streamingt2v_tpu.models.unet_blocks import _time_conv

        c = x.shape[-1]
        s1, b1 = _gn_params(self, "in_norm", c)
        h = _time_conv(x, self.kernel, c, "in_conv", gn=(s1, b1))
        s2, b2 = _gn_params(self, "out_norm", c)
        if blend_weight is None:
            blend_weight = jnp.ones(x.shape[:2], jnp.float32)
        return _time_conv(h, self.kernel, c, "out_conv", zero_init=True,
                          res=x, res_w=blend_weight, gn=(s2, b2))


class VideoResBlock(nn.Module):
    """Spatial ResnetBlock + temporal stack, learned-alpha blended
    (temporal_ae.py:16-81). Input (B, T, H, W, C)."""

    out_channels: int
    video_kernel_size: Tuple[int, int, int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        h = ResnetBlock(self.out_channels, name="spatial")(x.reshape(b * t, hh, ww, c))
        h = h.reshape(b, t, hh, ww, self.out_channels)
        mix = self.param("mix_factor", nn.initializers.zeros, (1,))
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))
        # alpha weights the TEMPORAL branch here (temporal_ae.py:74-79):
        # alpha*(h + conv) + (1-alpha)*h = h + alpha*conv, fused into the
        # time_stack's out_conv epilogue.
        bw = jnp.broadcast_to(alpha, (b, t)).astype(jnp.float32)
        return TemporalResStack(self.video_kernel_size, name="time_stack")(
            h, blend_weight=bw)


class AE3DConv(nn.Module):
    """conv2d followed by a temporal 3D conv (temporal_ae.py:84-105).
    Input (B, T, H, W, C)."""

    out_channels: int
    video_kernel_size: Tuple[int, int, int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x):
        from streamingt2v_tpu.models.unet_blocks import _time_conv

        b, t, hh, ww, c = x.shape
        h = nn.Conv(self.out_channels, (3, 3), name="conv")(x.reshape(b * t, hh, ww, c))
        h = h.reshape(b, t, hh, ww, self.out_channels)
        # (3,1,1) time mix: Pallas temporal conv on TPU (same routing and
        # param layout as the UNet temporal ResBlocks, unet_blocks._time_conv)
        return _time_conv(h, self.video_kernel_size, self.out_channels,
                          "time_mix_conv")


class VideoDecoder(nn.Module):
    """Temporal decoder tower (Decoder + conv-only time mode).
    Input (B, T, h, w, z) -> (B, T, 8h, 8w, 3)."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        b, t = z.shape[:2]

        def spatial(h, fn):
            bb, tt, hh, ww, cc = h.shape
            out = fn(h.reshape(bb * tt, hh, ww, cc))
            return out.reshape(bb, tt, *out.shape[1:])

        block_in = cfg.ch * cfg.ch_mult[-1]
        h = spatial(z, nn.Conv(block_in, (3, 3), name="conv_in"))
        h = VideoResBlock(block_in, cfg.video_kernel_size, name="mid_block_1")(h)
        h = spatial(h, AttnBlock(name="mid_attn_1"))
        h = VideoResBlock(block_in, cfg.video_kernel_size, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            block_out = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = VideoResBlock(block_out, cfg.video_kernel_size, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = spatial(h, Upsample(name=f"up_{i}_upsample"))
        c = h.shape[-1]
        s, bias = _gn_params(self, "norm_out", c)
        # per-frame statistics: the reference applies Decoder.norm_out on
        # the (B*T, C, H, W) stream (model.py:739-741)
        bb, tt, hh2, ww2, _ = h.shape
        h = group_norm(h.reshape(bb * tt, hh2, ww2, c), s, bias, eps=1e-6,
                       act="silu").reshape(bb, tt, hh2, ww2, c)
        return AE3DConv(cfg.out_ch, cfg.video_kernel_size, name="conv_out")(h)


class SpatialDecoder(nn.Module):
    """Pure-spatial Decoder (model.py:604) for the KL conditioning VAE.
    Input (N, h, w, z)."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), name="conv_in")(z)
        h = ResnetBlock(block_in, name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(block_in, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            block_out = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(name=f"up_{i}_upsample")(h)
        c = h.shape[-1]
        s, b = _gn_params(self, "norm_out", c)
        h = group_norm(h, s, b, eps=1e-6, act="silu")
        return nn.Conv(cfg.out_ch, (3, 3), name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Engine wrapper. `use_quant_conv` selects the legacy-KL layout used by
    the conditioning embedder (AutoencoderKLModeOnly, autoencoder.py:602);
    the first-stage engine has no quant convs (autoencoder.py:196-210)."""

    cfg: VAEConfig
    use_quant_conv: bool = False

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        if self.cfg.temporal_decoder:
            self.decoder = VideoDecoder(self.cfg, name="decoder")
        else:
            self.decoder = SpatialDecoder(self.cfg, name="decoder")
        if self.use_quant_conv:
            self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1), name="quant_conv")
            self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), name="post_quant_conv")

    def moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: (N, H, W, 3) -> (mean, logvar), each (N, H/8, W/8, z)."""
        m = self.encoder(x)
        if self.use_quant_conv:
            m = self.quant_conv(m)
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """Mode (key=None) or sample; returns scale_factor * z."""
        mean, logvar = self.moments(x)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return self.cfg.scale_factor * z

    def decode(self, z: jax.Array) -> jax.Array:
        """z: scaled latents; temporal decoder takes (B, T, h, w, z)."""
        z = z / self.cfg.scale_factor
        if self.use_quant_conv:
            orig = z.shape
            z2 = z.reshape((-1,) + orig[-3:])
            z2 = self.post_quant_conv(z2)
            z = z2.reshape(orig[:-1] + (z2.shape[-1],))
        return self.decoder(z)

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        """Round trip for init/tests. x: (B, T, H, W, 3) when temporal."""
        if self.cfg.temporal_decoder:
            b, t = x.shape[:2]
            z = self.encode(x.reshape((b * t,) + x.shape[2:]), key)
            z = z.reshape(b, t, *z.shape[1:])
        else:
            z = self.encode(x, key)
        return self.decode(z)
