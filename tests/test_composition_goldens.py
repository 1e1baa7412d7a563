"""Whole-model composition goldens.

The block-level goldens (test_torch_goldens.py) pin each block; these pin
the COMPOSITION — skip ordering, emb routing, level layout, CAM fusion —
by running a functional torch replica of the full reference VideoUNet
(structure per models/diffusion/video_model.py:297-618) driven by a
reference-named state dict, converting the same state dict through the
real checkpoint maps, and requiring the jax forward to match.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
from streamingt2v_tpu.utils.checkpoint import (
    controlnet_map,
    convert_state_dict,
    unet_map,
)

pytestmark = pytest.mark.slow

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# functional torch ops reading a reference-named state dict
# ---------------------------------------------------------------------------

def _lin(sd, k, x):
    return F.linear(x, sd[k + ".weight"], sd.get(k + ".bias"))


def _conv2(sd, k, x, stride=1):
    return F.conv2d(x, sd[k + ".weight"], sd[k + ".bias"], stride=stride, padding=1)


def _conv3(sd, k, x):
    return F.conv3d(x, sd[k + ".weight"], sd[k + ".bias"], padding=(1, 0, 0))


def _gn(sd, k, x, eps, groups=32):
    return F.group_norm(x, min(groups, x.shape[1]), sd[k + ".weight"], sd[k + ".bias"], eps)


def _ln(sd, k, x):
    return F.layer_norm(x, (x.shape[-1],), sd[k + ".weight"], sd[k + ".bias"], 1e-5)


def _mha(q, k, v, heads):
    b, n, inner = q.shape
    m = k.shape[1]
    dh = inner // heads
    qh = q.reshape(b, n, heads, dh).permute(0, 2, 1, 3)
    kh = k.reshape(b, m, heads, dh).permute(0, 2, 1, 3)
    vh = v.reshape(b, m, heads, dh).permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(qh, kh, vh)
    return o.permute(0, 2, 1, 3).reshape(b, n, inner)


def _attn(sd, p, x, ctx, heads):
    q = _lin(sd, f"{p}.to_q", x)
    k = _lin(sd, f"{p}.to_k", ctx)
    v = _lin(sd, f"{p}.to_v", ctx)
    return _lin(sd, f"{p}.to_out.0", _mha(q, k, v, heads))


def _geglu_ff(sd, p, x):
    a, gate = _lin(sd, f"{p}.net.0.proj", x).chunk(2, dim=-1)
    return _lin(sd, f"{p}.net.2", a * F.gelu(gate))


def _timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(
        -torch.log(torch.tensor(10000.0)) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _basic_block(sd, p, h, ctx, heads):
    h = h + _attn(sd, f"{p}.attn1", _ln(sd, f"{p}.norm1", h), _ln(sd, f"{p}.norm1", h), heads)
    h = h + _attn(sd, f"{p}.attn2", _ln(sd, f"{p}.norm2", h), ctx, heads)
    h = h + _geglu_ff(sd, f"{p}.ff", _ln(sd, f"{p}.norm3", h))
    return h


def _svt(sd, p, x, ctx, B, T, heads):
    """SpatialVideoTransformer (video_attention.py:174-333).
    x: (B*T, C, H, W); ctx: (B*T, L, D)."""
    c = x.shape[1]
    H, W = x.shape[2], x.shape[3]
    S = H * W
    x_in = x
    h = _gn(sd, f"{p}.norm", x, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(B * T, S, c)
    h = _lin(sd, f"{p}.proj_in", h)
    inner = h.shape[-1]

    frames = torch.arange(T).repeat(B)
    pos = _lin(sd, f"{p}.time_pos_embed.2",
               F.silu(_lin(sd, f"{p}.time_pos_embed.0", _timestep_embedding(frames, c))))

    h = _basic_block(sd, f"{p}.transformer_blocks.0", h, ctx, heads)

    x_mix = h + pos[:, None, :]
    x_mix = x_mix.reshape(B, T, S, inner).permute(0, 2, 1, 3).reshape(B * S, T, inner)
    time_ctx = ctx[::T].repeat_interleave(S, dim=0)
    tp = f"{p}.time_stack.0"
    x_mix = x_mix + _geglu_ff(sd, f"{tp}.ff_in", _ln(sd, f"{tp}.norm_in", x_mix))
    x_mix = _basic_block(sd, tp, x_mix, time_ctx, heads)
    x_mix = x_mix.reshape(B, S, T, inner).permute(0, 2, 1, 3).reshape(B * T, S, inner)

    alpha = torch.sigmoid(sd[f"{p}.time_mixer.mix_factor"])
    h = alpha * h + (1 - alpha) * x_mix
    h = _lin(sd, f"{p}.proj_out", h)
    return x_in + h.reshape(B * T, H, W, c).permute(0, 3, 1, 2)


def _res_half(sd, p, x, emb, dims):
    conv = _conv3 if dims == 3 else _conv2
    h = conv(sd, f"{p}.in_layers.2", F.silu(_gn(sd, f"{p}.in_layers.0", x, 1e-5)))
    e = _lin(sd, f"{p}.emb_layers.1", F.silu(emb))
    if dims == 3:  # emb (B, T, C) -> (B, C, T, 1, 1) (exchange_temb_dims)
        h = h + e.permute(0, 2, 1)[:, :, :, None, None]
    else:
        h = h + e[:, :, None, None]
    h = conv(sd, f"{p}.out_layers.3", F.silu(_gn(sd, f"{p}.out_layers.0", h, 1e-5)))
    if f"{p}.skip_connection.weight" in sd:
        x = F.conv2d(x, sd[f"{p}.skip_connection.weight"], sd[f"{p}.skip_connection.bias"]) \
            if dims == 2 else x
    return x + h


def _video_res(sd, p, x, emb, B, T):
    """VideoResBlock (video_model.py:16-85).  x: (B*T, C, H, W), emb (B*T, D)."""
    x_sp = _res_half(sd, p, x, emb, dims=2)
    c = x_sp.shape[1]
    xt = x_sp.reshape(B, T, c, *x_sp.shape[2:]).permute(0, 2, 1, 3, 4)
    emb_bt = emb.reshape(B, T, -1)
    x_tmp = _res_half(sd, f"{p}.time_stack", xt, emb_bt, dims=3)
    alpha = torch.sigmoid(sd[f"{p}.time_mixer.mix_factor"])
    out = alpha * xt + (1 - alpha) * x_tmp
    return out.permute(0, 2, 1, 3, 4).reshape(B * T, c, *x_sp.shape[2:])


def _cam_merger(sd, p, sample, cond, B, T, Tc):
    """ConditionalModel (models/cam/conditioning.py:84-146).
    sample: (B*T, C, H, W); cond: (B*Tc, C, H, W)."""
    c, H, W = sample.shape[1:]
    tt = f"{p}.temporal_transformer"
    heads = c // min(64, c)
    hs = sample.reshape(B, T, c, H, W).permute(0, 2, 1, 3, 4)
    hn = _gn(sd, f"{tt}.norm", hs, 1e-6)
    hn = hn.permute(0, 3, 4, 2, 1).reshape(B * H * W, T, c)
    hn = _lin(sd, f"{tt}.proj_in", hn)
    kv = cond.reshape(B, Tc, c, H, W).permute(0, 3, 4, 1, 2).reshape(B * H * W, Tc, c)
    o = _attn(sd, f"{tt}.attention", hn, kv, heads)
    resid = _lin(sd, f"{tt}.proj_out", o)
    resid = resid.reshape(B, H, W, T, c).permute(0, 3, 4, 1, 2).reshape(B * T, c, H, W)
    return sample + resid


def _emb_and_ctx(sd, p, cfg, t_cont, y, B, T):
    t_emb = _timestep_embedding(t_cont.repeat_interleave(T), cfg.model_channels)
    emb = _lin(sd, f"{p}.time_embed.2", F.silu(_lin(sd, f"{p}.time_embed.0", t_emb)))
    emb = emb + _lin(sd, f"{p}.label_emb.0.2",
                     F.silu(_lin(sd, f"{p}.label_emb.0.0", y.reshape(B * T, -1))))
    return emb


def _encoder_blocks(sd, p, cfg, h, emb, ctx, B, T):
    """input_blocks loop; returns (hs, h, final_ds)."""
    hs = [h]
    ds, tidx = 1, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            tk = f"{p}.input_blocks.{tidx}"
            h = _video_res(sd, f"{tk}.0", h, emb, B, T)
            if ds in cfg.attention_resolutions:
                heads = h.shape[1] // cfg.num_head_channels
                h = _svt(sd, f"{tk}.1", h, ctx, B, T, heads)
            hs.append(h)
            tidx += 1
        if level != len(cfg.channel_mult) - 1:
            ds *= 2
            h = _conv2(sd, f"{p}.input_blocks.{tidx}.0.op", h, stride=2)
            hs.append(h)
            tidx += 1
    return hs, h, ds


def torch_video_unet(sd, cfg, x, t_cont, ctx, y, hs_control=None, h_control_mid=None,
                     prefix="model.diffusion_model"):
    """Full reference VideoUNet forward (video_model.py:540-618), functional.

    x: (B, T, H, W, C_in) channel-last numpy-ish; returns same layout.
    """
    p = prefix
    B, T = x.shape[:2]
    xt = torch.as_tensor(np.asarray(x)).reshape(B * T, *x.shape[2:]).permute(0, 3, 1, 2)
    ctx_t = torch.as_tensor(np.asarray(ctx)).reshape(B * T, *ctx.shape[2:])
    y_t = torch.as_tensor(np.asarray(y))
    emb = _emb_and_ctx(sd, p, cfg, torch.as_tensor(np.asarray(t_cont)), y_t, B, T)

    h = _conv2(sd, f"{p}.input_blocks.0.0", xt)
    hs, h, ds = _encoder_blocks(sd, p, cfg, h, emb, ctx_t, B, T)

    if hs_control is not None:
        fused = []
        for i, h_skip in enumerate(hs):
            mp = f"{p}.cross_attention_merger_input_blocks.{i}"
            fused.append(_cam_merger(sd, mp, h_skip, hs_control[i], B, T,
                                     hs_control[i].shape[0] // B))
        hs = fused

    mb = f"{p}.middle_block"
    h = _video_res(sd, f"{mb}.0", h, emb, B, T)
    h = _svt(sd, f"{mb}.1", h, ctx_t, B, T, h.shape[1] // cfg.num_head_channels)
    h = _video_res(sd, f"{mb}.2", h, emb, B, T)
    if h_control_mid is not None:
        h = _cam_merger(sd, f"{p}.cross_attention_merger_mid_block", h, h_control_mid,
                        B, T, h_control_mid.shape[0] // B)

    blk = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            tk = f"{p}.output_blocks.{blk}"
            h = torch.cat([h, hs.pop()], dim=1)
            h = _video_res(sd, f"{tk}.0", h, emb, B, T)
            nxt = 1
            if ds in cfg.attention_resolutions:
                h = _svt(sd, f"{tk}.{nxt}", h, ctx_t, B, T,
                         h.shape[1] // cfg.num_head_channels)
                nxt += 1
            if level and i == cfg.num_res_blocks:
                ds //= 2
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = _conv2(sd, f"{tk}.{nxt}.conv", h)
            blk += 1

    h = F.silu(_gn(sd, f"{p}.out.0", h, 1e-5))
    h = _conv2(sd, f"{p}.out.2", h)
    return h.reshape(B, T, *h.shape[1:]).permute(0, 1, 3, 4, 2).numpy()


def torch_controlnet(sd, ucfg, ccfg, x, t_cont, ctx, y, pix, prefix="controlnet"):
    """ControlNet forward (models/control/controlnet.py:496-554), functional.
    Returns (hs, mid) in torch (B*Tc, C, h, w) layout."""
    p = prefix
    B, T = x.shape[:2]
    xt = torch.as_tensor(np.asarray(x)).reshape(B * T, *x.shape[2:]).permute(0, 3, 1, 2)
    ctx_t = torch.as_tensor(np.asarray(ctx)).reshape(B * T, *ctx.shape[2:])
    emb = _emb_and_ctx(sd, p, ucfg, torch.as_tensor(np.asarray(t_cont)),
                       torch.as_tensor(np.asarray(y)), B, T)

    # conditioning embedding (4-conv downsampler with LayerNorms)
    ce = f"{p}.controlnet_cond_embedding"
    pt = torch.as_tensor(np.asarray(pix)).reshape(B * T, *pix.shape[2:]).permute(0, 3, 1, 2)
    ch = F.silu(_conv2(sd, f"{ce}.conv_in", pt))
    stride = 2 if ccfg.downsample_controlnet_cond else 1
    for i in range(len(ccfg.conditioning_embedding_out_channels) - 1):
        ch = _conv2(sd, f"{ce}.blocks.{2*i}", ch)
        ch = _ln(sd, f"{ce}.norms.{2*i}", ch.permute(0, 3, 2, 1)).permute(0, 3, 2, 1)
        ch = F.silu(ch)
        ch = _conv2(sd, f"{ce}.blocks.{2*i+1}", ch, stride=stride)
        ch = _ln(sd, f"{ce}.norms.{2*i+1}", ch.permute(0, 3, 2, 1)).permute(0, 3, 2, 1)
        ch = F.silu(ch)
    cond_embed = F.conv2d(ch, sd[f"{ce}.conv_out.weight"], sd[f"{ce}.conv_out.bias"],
                          padding=1)

    h = _conv2(sd, f"{p}.input_blocks.0.0", xt) + cond_embed
    hs, h, _ = _encoder_blocks(sd, p, ucfg, h, emb, ctx_t, B, T)
    mb = f"{p}.middle_block"
    h = _video_res(sd, f"{mb}.0", h, emb, B, T)
    h = _svt(sd, f"{mb}.1", h, ctx_t, B, T, h.shape[1] // ucfg.num_head_channels)
    h = _video_res(sd, f"{mb}.2", h, emb, B, T)
    return hs, h


# ---------------------------------------------------------------------------
# state-dict synthesis (inverse of the converter's transforms, by rank)
# ---------------------------------------------------------------------------

def _synth_sd(mapping, template, rng):
    from streamingt2v_tpu.utils.checkpoint import flatten_params

    flat = flatten_params(template["params"])
    sd = {}
    for fx, (tk, _t) in mapping.items():
        t = flat[fx]
        if t.ndim == 4:
            shape = (t.shape[3], t.shape[2], t.shape[0], t.shape[1])
        elif t.ndim == 5:
            shape = (t.shape[4], t.shape[3], t.shape[0], t.shape[1], t.shape[2])
        elif t.ndim == 2:
            shape = (t.shape[1], t.shape[0])
        else:
            shape = tuple(t.shape)
        # Small weights keep every residual block a near-identity
        # perturbation: fp32 reassociation noise then grows linearly with
        # depth instead of exponentially (a deep random-weight net is
        # chaotic and amplifies 1e-6 input noise beyond any tolerance).
        w = (rng.randn(*shape) * 0.05).astype(np.float32)
        if tk.endswith(".weight") and t.ndim == 1:
            # norm scales center at 1 — mean-zero scales collapse the
            # activations and the out-head GroupNorm then amplifies tiny
            # fp32 differences into spurious golden failures
            w += 1.0
        sd[tk] = w
    return sd


def _torch_sd(sd):
    return {k: torch.from_numpy(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_full_video_unet_golden():
    """Full tiny-but-structural VideoUNet (controlnet_mode=False, the
    first-chunk SVD-XT architecture) vs the functional torch assembly,
    weights through the real converter."""
    from streamingt2v_tpu.models.video_unet import VideoUNet

    cfg = VideoUNetConfig.tiny(controlnet_mode=False)
    unet = VideoUNet(cfg)
    B, T, H, W = 1, 3, 8, 8
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, H, W, cfg.in_channels).astype(np.float32)
    t_cont = np.asarray([0.7], np.float32)
    ctx = rng.randn(B, T, 2, cfg.context_dim).astype(np.float32)
    y = rng.randn(B, T, cfg.adm_in_channels).astype(np.float32)

    tmpl = jax.eval_shape(unet.init, jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(t_cont), jnp.asarray(ctx), jnp.asarray(y))
    mapping = unet_map(cfg)
    sd = _synth_sd(mapping, tmpl, rng)

    ref = torch_video_unet(_torch_sd(sd), cfg, x, t_cont, ctx, y)

    params, _ = convert_state_dict(sd, mapping, tmpl)
    out = jax.jit(unet.apply)(params, jnp.asarray(x), jnp.asarray(t_cont),
                              jnp.asarray(ctx), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_full_streaming_denoise_golden():
    """ControlNet -> CAM-fused VideoUNet (the full streaming network fn)
    vs the functional torch assembly — the composition-level net for the
    real-checkpoint path (video_model.py:582-605, wrappers.py:23-78)."""
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper

    cfg = VideoUNetConfig.tiny(controlnet_mode=True)
    ccfg = ControlNetConfig.tiny()
    unet, cn = VideoUNet(cfg), ControlNet(cfg, ccfg)
    B, T, FC, H, W = 1, 4, 2, 8, 8
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, H, W, cfg.in_channels).astype(np.float32)
    t_cont = np.asarray([0.4], np.float32)
    ctx = rng.randn(B, T, 1, cfg.context_dim).astype(np.float32)
    y = rng.randn(B, T, cfg.adm_in_channels).astype(np.float32)
    pix = rng.randn(B, FC, H * scale, W * scale, 3).astype(np.float32)

    u_tmpl = jax.eval_shape(unet.init, jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(t_cont), jnp.asarray(ctx), jnp.asarray(y))
    c_tmpl = jax.eval_shape(cn.init, jax.random.PRNGKey(1), jnp.asarray(x[:, :FC]),
                            jnp.asarray(t_cont), jnp.asarray(ctx[:, :FC]),
                            jnp.asarray(y[:, :FC]), jnp.asarray(pix))
    u_map = unet_map(cfg)
    c_map = controlnet_map(cfg, ccfg)
    u_sd = _synth_sd(u_map, u_tmpl, rng)
    c_sd = _synth_sd(c_map, c_tmpl, rng)

    tsd_u, tsd_c = _torch_sd(u_sd), _torch_sd(c_sd)
    hs_ctrl, mid_ctrl = torch_controlnet(
        tsd_c, cfg, ccfg, x[:, :FC], t_cont, ctx[:, :FC], y[:, :FC], pix
    )
    ref = torch_video_unet(tsd_u, cfg, x, t_cont, ctx, y,
                           hs_control=hs_ctrl, h_control_mid=mid_ctrl)

    u_params, _ = convert_state_dict(u_sd, u_map, u_tmpl)
    c_params, _ = convert_state_dict(c_sd, c_map, c_tmpl)

    def fwd(x):
        hs, mid = cn.apply(c_params, jnp.asarray(x[:, :FC]), jnp.asarray(t_cont),
                           jnp.asarray(ctx[:, :FC]), jnp.asarray(y[:, :FC]),
                           jnp.asarray(pix))
        return unet.apply(u_params, jnp.asarray(x), jnp.asarray(t_cont),
                          jnp.asarray(ctx), jnp.asarray(y),
                          hs_control=hs, h_control_mid=mid)

    out = jax.jit(fwd)(x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)
