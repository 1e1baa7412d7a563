"""EMA-VFI — stage-3 2x frame interpolation.

TPU rebuild of the reference's vendored EMA-VFI
(i2v_enhance/thirdparty/VFI/): a MotionFormer appearance+motion feature
pyramid with windowed inter-frame attention (feature_extractor.py:111-515),
two coarse-to-fine flow heads with PixelShuffle upsampling
(flow_estimation.py:17-106), backward warping (ops/warp.py), and a
residual refinement UNet (refine.py:32-71).  Inference supports the
reference's flip-TTA averaging (Trainer.py:85-101).

Layout: channel-last (N, H, W, C); the two frames are stacked along batch
as (img0s ‖ img1s) exactly like the reference.  Images are in [0, 1].
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import VFIConfig
from streamingt2v_tpu.ops import layer_norm
from streamingt2v_tpu.ops.warp import backward_warp


def prelu(module: nn.Module, name: str, x: jax.Array) -> jax.Array:
    """Per-channel PReLU (torch nn.PReLU(C), init 0.25)."""
    a = module.param(name, nn.initializers.constant(0.25), (x.shape[-1],))
    return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """(N, H, W, C*f^2) -> (N, H*f, W*f, C), matching torch PixelShuffle
    channel ordering (C index varies slowest over out-channel, then fy, fx)."""
    n, h, w, c = x.shape
    oc = c // (factor * factor)
    x = x.reshape(n, h, w, oc, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * factor, w * factor, oc)


def resize_bilinear(x: jax.Array, scale: float) -> jax.Array:
    """torch F.interpolate(bilinear, align_corners=False) semantics: NO
    antialiasing on downscale (jax.image.resize defaults to antialias)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, int(h * scale), int(w * scale), c),
                            method="bilinear", antialias=False)


class ConvPReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel // 2) * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=(self.stride,) * 2,
                    padding=pad, kernel_dilation=(self.dilation,) * 2, name="conv")(x)
        return prelu(self, "prelu", x)


class ConvBlock(nn.Module):
    """depths x (conv3x3 + PReLU) (feature_extractor.py ConvBlock)."""

    features: int
    depth: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = ConvPReLU(self.features, name=f"layer_{i}")(x)
        return x


# ---------------------------------------------------------------------------
# windowed inter-frame attention
# ---------------------------------------------------------------------------

def window_partition(x: jax.Array, ws: Tuple[int, int]) -> jax.Array:
    """(B, H, W, C) -> (B * nH * nW, ws0*ws1, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws[0], ws[0], w // ws[1], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0] * ws[1], c)


def window_reverse(windows: jax.Array, ws: Tuple[int, int], h: int, w: int) -> jax.Array:
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws[0] // ws[1])
    x = windows.reshape(b, h // ws[0], w // ws[1], ws[0], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _center_pad_hw(h: int, w: int, ws: Tuple[int, int]):
    ph = math.ceil(h / ws[0]) * ws[0] - h
    pw = math.ceil(w / ws[1]) * ws[1] - w
    return ph, pw


def _window_masks(h: int, w: int, ws: Tuple[int, int], shift: Tuple[int, int],
                  pad: Tuple[int, int]) -> Optional[np.ndarray]:
    """Static (numpy) Swin-style attention masks for center padding and/or
    cyclic shift (feature_extractor.py:27-62, 218-252).  Returns
    (nW, N, N) additive mask or None."""
    ph, pw = pad
    hp, wp = h + ph, w + pw
    if ph == 0 and pw == 0 and shift == (0, 0):
        return None
    region = np.zeros((hp, wp), np.int32)
    cnt = 0
    if ph > 0 or pw > 0:
        h_sl = [(0, ph // 2), (ph // 2, h + ph // 2), (h + ph // 2, hp)]
        w_sl = [(0, pw // 2), (pw // 2, w + pw // 2), (w + pw // 2, wp)]
        for (h0, h1) in h_sl:
            for (w0, w1) in w_sl:
                region[h0:h1, w0:w1] = cnt
                cnt += 1
    if shift != (0, 0):
        shift_region = np.zeros((hp, wp), np.int32)
        cnt = 0
        h_sl = [(0, hp - ws[0]), (hp - ws[0], hp - shift[0]), (hp - shift[0], hp)]
        w_sl = [(0, wp - ws[1]), (wp - ws[1], wp - shift[1]), (wp - shift[1], wp)]
        for (h0, h1) in h_sl:
            for (w0, w1) in w_sl:
                shift_region[h0:h1, w0:w1] = cnt
                cnt += 1
        # combine: roll the pad-region map with the shift, pair with shifted map
        region = np.roll(region, (-shift[0], -shift[1]), axis=(0, 1)) * 16 + shift_region
    m = region.reshape(hp // ws[0], ws[0], wp // ws[1], ws[1]).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws[0] * ws[1])
    mask = (m[:, None, :] != m[:, :, None]).astype(np.float32) * -100.0
    return mask


class InterFrameAttention(nn.Module):
    """Windowed cross-frame attention + motion feature extraction
    (feature_extractor.py:111-176).  q from x1, k/v from x2 (the other
    frame's windows); motion = proj(attn @ cor_embed - cor_embed)."""

    dim: int
    motion_dim: int
    heads: int

    @nn.compact
    def __call__(self, x1, x2, cor, mask=None):
        b, n, c = x1.shape
        hd = c // self.heads
        q = nn.Dense(c, name="q")(x1)
        kv = nn.Dense(2 * c, name="kv")(x2)
        k, v = jnp.split(kv, 2, axis=-1)
        cor_embed_flat = nn.Dense(self.motion_dim, name="cor_embed")(cor)

        def heads_of(t, d):
            return t.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_of(q, hd), heads_of(k, hd), heads_of(v, hd)
        ch = heads_of(cor_embed_flat, self.motion_dim // self.heads)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh).astype(jnp.float32) * (hd**-0.5)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.heads, n, n) + mask[None, :, None]
            attn = attn.reshape(b, self.heads, n, n)
        p = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        x = jnp.einsum("bhnm,bhmd->bhnd", p, vh).transpose(0, 2, 1, 3).reshape(b, n, c)
        c_rev = jnp.einsum("bhnm,bhmd->bhnd", p, ch).transpose(0, 2, 1, 3).reshape(b, n, -1)
        motion = nn.Dense(self.motion_dim, name="motion_proj")(c_rev - cor_embed_flat)
        x = nn.Dense(c, name="proj")(x)
        return x, motion


class MotionFormerBlock(nn.Module):
    dim: int
    motion_dim: int
    heads: int
    window_size: int
    shift: bool
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, cor, h, w, b):
        """x: (2B, H*W, C); cor: (2B, H*W, 2) normalized coordinates."""
        ws = (self.window_size, self.window_size)
        shift = (ws[0] // 2, ws[1] // 2) if self.shift else (0, 0)
        ph, pw = _center_pad_hw(h, w, ws)
        mask_np = _window_masks(h, w, ws, shift, (ph, pw))
        mask = jnp.asarray(mask_np) if mask_np is not None else None

        x_img = x.reshape(-1, h, w, x.shape[-1])
        cor_img = cor.reshape(-1, h, w, 2)
        pad_spec = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        x_pad = jnp.pad(x_img, pad_spec)
        cor_pad = jnp.pad(cor_img, pad_spec)
        if shift != (0, 0):
            x_pad = jnp.roll(x_pad, (-shift[0], -shift[1]), axis=(1, 2))
            cor_pad = jnp.roll(cor_pad, (-shift[0], -shift[1]), axis=(1, 2))
        hp, wp = x_pad.shape[1:3]

        x_win = window_partition(x_pad, ws)
        cor_win = window_partition(cor_pad, ws)
        nwb = x_win.shape[0]

        s1 = self.param("norm1_scale", nn.initializers.ones, (self.dim,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (self.dim,))
        x_norm = layer_norm(x_win, s1, b1, eps=1e-6)
        # swap frame halves so each frame attends to the other
        x_rev = jnp.concatenate([x_norm[nwb // 2:], x_norm[: nwb // 2]], axis=0)
        x_app, x_motion = InterFrameAttention(
            self.dim, self.motion_dim, self.heads, name="attn"
        )(x_norm, x_rev, cor_win, mask)
        x_norm = x_norm + x_app

        back = window_reverse(x_norm, ws, hp, wp)
        motion = window_reverse(x_motion, ws, hp, wp)
        if shift != (0, 0):
            back = jnp.roll(back, (shift[0], shift[1]), axis=(1, 2))
            motion = jnp.roll(motion, (shift[0], shift[1]), axis=(1, 2))
        back = back[:, ph // 2: ph // 2 + h, pw // 2: pw // 2 + w].reshape(x.shape)
        motion = motion[:, ph // 2: ph // 2 + h, pw // 2: pw // 2 + w].reshape(
            x.shape[0], h * w, -1
        )

        s2 = self.param("norm2_scale", nn.initializers.ones, (self.dim,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (self.dim,))
        hmlp = layer_norm(back, s2, b2, eps=1e-6)
        hmlp = nn.Dense(self.dim * self.mlp_ratio, name="mlp_fc1")(hmlp)
        # depthwise 3x3 between FC layers (Mlp.dwconv, feature_extractor.py:75-109)
        hmlp_img = hmlp.reshape(-1, h, w, hmlp.shape[-1])
        hmlp_img = nn.Conv(hmlp.shape[-1], (3, 3), feature_group_count=hmlp.shape[-1],
                           name="mlp_dwconv")(hmlp_img)
        hmlp = jax.nn.gelu(hmlp_img.reshape(hmlp.shape).astype(jnp.float32),
                           approximate=False).astype(hmlp.dtype)
        hmlp = nn.Dense(self.dim, name="mlp_fc2")(hmlp)
        return back + hmlp, motion


class OverlapPatchEmbed(nn.Module):
    embed_dim: int
    patch: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embed_dim, (self.patch, self.patch),
                    strides=(self.stride,) * 2, padding=self.patch // 2, name="proj")(x)
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
        s = self.param("norm_scale", nn.initializers.ones, (c,))
        b = self.param("norm_bias", nn.initializers.zeros, (c,))
        return layer_norm(x, s, b, eps=1e-6), h, w


class CrossScalePatchEmbed(nn.Module):
    """Merge the conv pyramid into one token map via dilated strided convs
    (feature_extractor.py:350-389)."""

    in_dims: Tuple[int, ...]
    embed_dim: int

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array]):
        base = self.in_dims[0]
        ys = []
        k = 0
        for i in range(len(self.in_dims)):
            for j in range(2**i):
                ys.append(nn.Conv(
                    base, (3, 3), strides=(2 ** (i + 1),) * 2, padding=1 + j,
                    kernel_dilation=(1 + j,) * 2, name=f"layer_{k}",
                )(xs[-1 - i]))
                k += 1
        x = nn.Conv(self.embed_dim, (1, 1), name="proj")(jnp.concatenate(ys, axis=-1))
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
        s = self.param("norm_scale", nn.initializers.ones, (c,))
        b = self.param("norm_bias", nn.initializers.zeros, (c,))
        return layer_norm(x, s, b, eps=1e-6), h, w


class MotionFormer(nn.Module):
    """Appearance + motion feature pyramid (feature_extractor.py:391-505).
    Input: img0, img1 (B, H, W, 3); features computed on (2B, ...)."""

    cfg: VFIConfig

    @nn.compact
    def __call__(self, img0, img1):
        cfg = self.cfg
        b = img0.shape[0]
        num_stages = len(cfg.embed_dims)
        conv_stages = num_stages - len(cfg.num_heads)
        x = jnp.concatenate([img0, img1], axis=0)
        appearance: List[jax.Array] = []
        motion: List[Optional[jax.Array]] = []
        xs = []
        for i in range(num_stages):
            if i < conv_stages:
                if i > 0:
                    x = nn.Conv(cfg.embed_dims[i], (3, 3), strides=(2, 2), padding=1,
                                name=f"patch_embed_{i}_conv")(x)
                    x = prelu(self, f"patch_embed_{i}_prelu", x)
                x = ConvBlock(cfg.embed_dims[i], cfg.depths[i], name=f"block_{i}")(x)
                xs.append(x)
                appearance.append(x)
                motion.append(None)
            else:
                if i == conv_stages:
                    x, h, w = CrossScalePatchEmbed(
                        tuple(cfg.embed_dims[:i]), cfg.embed_dims[i],
                        name=f"patch_embed_{i}",
                    )(xs)
                else:
                    x, h, w = OverlapPatchEmbed(
                        cfg.embed_dims[i], name=f"patch_embed_{i}"
                    )(x)
                # normalized coordinate grid (get_cor, feature_extractor.py:459-466)
                cx = np.linspace(-1, 1, w, dtype=np.float32)
                cy = np.linspace(-1, 1, h, dtype=np.float32)
                cor = np.stack(np.meshgrid(cx, cy), axis=-1).reshape(1, h * w, 2)
                cor = jnp.broadcast_to(jnp.asarray(cor), (x.shape[0], h * w, 2))
                heads = cfg.num_heads[i - conv_stages]
                wsize = cfg.window_sizes[i - conv_stages]
                motions = []
                for j in range(cfg.depths[i]):
                    x, m = MotionFormerBlock(
                        cfg.embed_dims[i], cfg.motion_dims[i], heads, wsize,
                        shift=(j % 2 == 1), name=f"block_{i}_{j}",
                    )(x, cor, h, w, b)
                    motions.append(m.reshape(2 * b, h, w, -1))
                s = self.param(f"norm_{i}_scale", nn.initializers.ones, (x.shape[-1],))
                bb = self.param(f"norm_{i}_bias", nn.initializers.zeros, (x.shape[-1],))
                x = layer_norm(x, s, bb, eps=1e-6)
                x = x.reshape(2 * b, h, w, -1)
                appearance.append(x)
                motion.append(jnp.concatenate(motions, axis=-1))
        return appearance, motion


class FlowHead(nn.Module):
    """Coarse-to-fine flow/mask head (flow_estimation.py:17-44)."""

    scale: int
    hidden: int

    @nn.compact
    def __call__(self, motion_feature, x, flow):
        mf = pixel_shuffle(pixel_shuffle(motion_feature, 2), 2)  # /16 -> /4 etc.
        if self.scale != 4:
            x = resize_bilinear(x, 4.0 / self.scale)
        if flow is not None:
            if self.scale != 4:
                flow = resize_bilinear(flow, 4.0 / self.scale) * (4.0 / self.scale)
            x = jnp.concatenate([x, flow], axis=-1)
        h = jnp.concatenate([mf, x], axis=-1)
        h = ConvPReLU(self.hidden, name="conv_0")(h)
        h = ConvPReLU(self.hidden, name="conv_1")(h)
        h = ConvPReLU(5, name="conv_2")(h)
        if self.scale != 4:
            h = resize_bilinear(h, self.scale / 4.0)
            flow_out = h[..., :4] * (self.scale // 4)
        else:
            flow_out = h[..., :4]
        return flow_out, h[..., 4:5]


class RefineUnet(nn.Module):
    """Residual refinement UNet (refine.py:32-71)."""

    c: int

    @nn.compact
    def __call__(self, img0, img1, w0, w1, mask, flow, c0, c1):
        def down(x, feats, name):
            x = ConvPReLU(feats, stride=2, name=f"{name}_0")(x)
            return ConvPReLU(feats, name=f"{name}_1")(x)

        def up(x, feats, name):
            # torch ConvTranspose2d(k=4, s=2, p=1) == exact 2x; flax needs
            # padding="SAME" for that output arithmetic
            x = nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                 padding="SAME", name=f"{name}_deconv")(x)
            return prelu(self, f"{name}_prelu", x)

        c = self.c
        s0 = down(jnp.concatenate([img0, img1, w0, w1, mask, flow, c0[0], c1[0]], -1), 2 * c, "down0")
        s1 = down(jnp.concatenate([s0, c0[1], c1[1]], -1), 4 * c, "down1")
        s2 = down(jnp.concatenate([s1, c0[2], c1[2]], -1), 8 * c, "down2")
        s3 = down(jnp.concatenate([s2, c0[3], c1[3]], -1), 16 * c, "down3")
        x = up(jnp.concatenate([s3, c0[4], c1[4]], -1), 8 * c, "up0")
        x = up(jnp.concatenate([x, s2], -1), 4 * c, "up1")
        x = up(jnp.concatenate([x, s1], -1), 2 * c, "up2")
        x = up(jnp.concatenate([x, s0], -1), c, "up3")
        x = nn.Conv(3, (3, 3), name="conv")(x)
        return jax.nn.sigmoid(x)


class MultiScaleFlow(nn.Module):
    """Full EMA-VFI network (flow_estimation.py:47-141)."""

    cfg: VFIConfig

    def setup(self):
        cfg = self.cfg
        self.feature_bone = MotionFormer(cfg, name="feature_bone")
        n_stage = len(cfg.hidden_dims)
        heads = []
        for i in range(n_stage):
            heads.append(FlowHead(cfg.scales[-1 - i], cfg.hidden_dims[-1 - i],
                                  name=f"head_{i}"))
        self.blocks = heads
        self.unet = RefineUnet(cfg.embed_dims[0] * 2, name="unet")

    def calculate_flow(self, img0, img1, timestep: float = 0.5, af=None, mf=None):
        """Two-stage coarse-to-fine flow + mask (flow_estimation.py:69-97).
        Features may be precomputed (hr/multi inference)."""
        cfg = self.cfg
        b = img0.shape[0]
        if af is None or mf is None:
            af, mf = self.feature_bone(img0, img1)
        flow, mask = None, None
        warped0, warped1 = img0, img1
        for i in range(len(cfg.hidden_dims)):
            mfi = mf[-1 - i]
            t = jnp.full_like(mfi[:b], timestep)
            motion_feat = jnp.concatenate(
                [t * mfi[:b], (1 - t) * mfi[b:], af[-1 - i][:b], af[-1 - i][b:]], axis=-1
            )
            if flow is not None:
                x_in = jnp.concatenate([img0, img1, warped0, warped1, mask], axis=-1)
                flow_d, mask_d = self.blocks[i](motion_feat, x_in, flow)
                flow = flow + flow_d
                mask = mask + mask_d
            else:
                flow, mask = self.blocks[i](
                    motion_feat, jnp.concatenate([img0, img1], axis=-1), None
                )
            warped0 = backward_warp(img0, flow[..., 0:2])
            warped1 = backward_warp(img1, flow[..., 2:4])
        return flow, mask

    def warp_and_refine(self, img0, img1, af, flow, mask):
        """coraseWarp_and_Refine (flow_estimation.py:99-110)."""
        cfg = self.cfg
        b = img0.shape[0]
        warped0 = backward_warp(img0, flow[..., 0:2])
        warped1 = backward_warp(img1, flow[..., 2:4])
        c0, c1 = [], []
        fl = flow
        for feat in af[: len(cfg.embed_dims)]:
            c0.append(backward_warp(feat[:b], fl[..., 0:2]))
            c1.append(backward_warp(feat[b:], fl[..., 2:4]))
            fl = resize_bilinear(fl, 0.5) * 0.5
        res = self.unet(img0, img1, warped0, warped1, mask, flow, c0, c1)
        res = res * 2.0 - 1.0
        m = jax.nn.sigmoid(mask)
        merged = warped0 * m + warped1 * (1 - m)
        return jnp.clip(merged + res, 0.0, 1.0)

    def hr_forward(self, img0, img1, timestep: float = 0.5, down_scale: float = 0.5):
        """hr_inference (Trainer.py:54-84): flow at down_scale, refine full."""
        i0d = resize_bilinear(img0, down_scale)
        i1d = resize_bilinear(img1, down_scale)
        flow, mask = self.calculate_flow(i0d, i1d, timestep)
        flow = resize_bilinear(flow, 1.0 / down_scale) * (1.0 / down_scale)
        mask = resize_bilinear(mask, 1.0 / down_scale)
        af, _ = self.feature_bone(img0, img1)
        return self.warp_and_refine(img0, img1, af, flow, mask)

    def multi_forward(self, img0, img1, time_list):
        """multi_inference (Trainer.py:103-131): one backbone pass, many
        timesteps."""
        af, mf = self.feature_bone(img0, img1)
        preds = []
        for t in time_list:
            flow, mask = self.calculate_flow(img0, img1, t, af, mf)
            preds.append(self.warp_and_refine(img0, img1, af, flow, mask))
        return preds

    def __call__(self, img0, img1, timestep: float = 0.5):
        cfg = self.cfg
        b = img0.shape[0]
        af, mf = self.feature_bone(img0, img1)
        flow, mask = self.calculate_flow(img0, img1, timestep, af, mf)
        return self.warp_and_refine(img0, img1, af, flow, mask)


def interpolate_pair(model: MultiScaleFlow, params, img0, img1,
                     timestep: float = 0.5, tta: bool = True) -> jax.Array:
    """Model.inference with fast flip-TTA (Trainer.py:85-101).
    img0/img1: (B, H, W, 3) in [0,1]."""
    if not tta:
        return model.apply(params, img0, img1, timestep)
    flip = lambda x: x[:, ::-1, ::-1]
    i0 = jnp.concatenate([img0, flip(img0)], axis=0)
    i1 = jnp.concatenate([img1, flip(img1)], axis=0)
    pred = model.apply(params, i0, i1, timestep)
    b = img0.shape[0]
    return (pred[:b] + flip(pred[b:])) / 2.0
