"""Goldens against the ACTUAL reference modules (VERDICT r2 item 3).

Unlike test_torch_goldens.py / test_composition_goldens.py (hand-built
functional torch replicas), the torch side here is the reference's own
code imported from /root/reference/code via the real-math shims in
_reference_import.py:

- models/diffusion/video_model.py:88   VideoUNet
- models/control/controlnet.py:124     ControlNet
- models/svd/sgm/modules/autoencoding/temporal_ae.py:291  VideoDecoder
- i2v_enhance/unet_i2vgen_xl.py:159    I2VGenXLUNet

Each test randomizes the reference module's own state_dict (small
weights, norm scales at 1 — see test_composition_goldens.py for why),
loads it back into the reference module, converts the SAME dict through
our checkpoint maps, and requires the JAX forward to match the reference
forward.  This also asserts the converter consumes every reference key
(no orphans) and maps every flax param (no missing), at tiny width.
"""

import numpy as np
import pytest
import torch

from _reference_import import install_shims

install_shims()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from streamingt2v_tpu.config import (  # noqa: E402
    ControlNetConfig,
    VAEConfig,
    VideoUNetConfig,
)
from streamingt2v_tpu.utils.checkpoint import (  # noqa: E402
    controlnet_map,
    convert_state_dict,
    unet_map,
    vae_video_decoder_map,
)

pytestmark = pytest.mark.slow

torch.manual_seed(0)


def _randomize(module: torch.nn.Module, rng, scale=0.05):
    """Random small weights (norm-ish 1-d .weight centered at 1) so deep
    residual stacks stay near-identity; returns the numpy state dict."""
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            new[k] = v
            continue
        w = (rng.randn(*v.shape) * scale).astype(np.float32)
        if k.endswith(".weight") and v.ndim == 1:
            w += 1.0
        new[k] = torch.from_numpy(w)
    module.load_state_dict(new)
    module.eval()
    return {k: v.numpy() for k, v in new.items() if v.dtype.is_floating_point}


def _convert(sd, mapping, tmpl):
    """convert_state_dict + orphan check: every reference key must be
    consumed by the mapping (else our mapping misses reference params)."""
    params, missing = convert_state_dict(sd, mapping, tmpl)
    assert not missing
    used = set()
    for tk, _t in mapping.values():
        used.update(tk if isinstance(tk, tuple) else (tk,))
    orphans = sorted(set(sd) - used)
    assert not orphans, f"reference keys not consumed: {orphans[:10]}"
    return params


def _ref_unet_kwargs(cfg: VideoUNetConfig, num_cond_frames=3):
    """Reference VideoUNet/ControlNet constructor args mirroring our
    config (reference config.yaml:69-115)."""
    return dict(
        in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_head_channels=cfg.num_head_channels,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
        adm_in_channels=cfg.adm_in_channels,
        num_classes="sequential",
        use_spatial_context=cfg.use_spatial_context,
        use_linear_in_transformer=cfg.use_linear_in_transformer,
        extra_ff_mix_layer=cfg.extra_ff_mix_layer,
        merge_strategy=cfg.merge_strategy,
        merge_factor=cfg.merge_factor,
        video_kernel_size=list(cfg.video_kernel_size),
    )


def test_reference_video_unet_golden():
    """Our VideoUNet vs the reference's own VideoUNet forward
    (video_model.py:540-618), controlnet_mode=False (SVD-XT first-chunk
    architecture), weights through unet_map."""
    from models.diffusion.video_model import VideoUNet as RefVideoUNet

    from streamingt2v_tpu.models.video_unet import VideoUNet

    cfg = VideoUNetConfig.tiny(controlnet_mode=False)
    ref = RefVideoUNet(
        num_conditional_frames=3, controlnet_mode=False, **_ref_unet_kwargs(cfg)
    )
    rng = np.random.RandomState(7)
    sd = _randomize(ref, rng)

    B, T, H, W, L = 1, 3, 8, 8, 2
    x = rng.randn(B, T, H, W, cfg.in_channels).astype(np.float32)
    t_cont = np.asarray([0.7], np.float32)
    ctx = rng.randn(B, T, L, cfg.context_dim).astype(np.float32)
    y = rng.randn(B, T, cfg.adm_in_channels).astype(np.float32)

    with torch.no_grad():
        xt = torch.as_tensor(x).reshape(B * T, H, W, -1).permute(0, 3, 1, 2)
        out_ref = ref(
            xt,
            torch.as_tensor(t_cont).repeat_interleave(T),
            context=torch.as_tensor(ctx).reshape(B * T, L, -1),
            y=torch.as_tensor(y).reshape(B * T, -1),
            num_video_frames=T,
            image_only_indicator=torch.zeros(B, T),
        )
    ref_np = (
        out_ref.reshape(B, T, -1, H, W).permute(0, 1, 3, 4, 2).numpy()
    )

    unet = VideoUNet(cfg)
    tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t_cont),
        jnp.asarray(ctx), jnp.asarray(y)
    )
    prefixed = {f"model.diffusion_model.{k}": v for k, v in sd.items()}
    params = _convert(prefixed, unet_map(cfg), tmpl)
    out = jax.jit(unet.apply)(
        params, jnp.asarray(x), jnp.asarray(t_cont), jnp.asarray(ctx),
        jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(out), ref_np, atol=5e-4, rtol=5e-4)


def test_reference_controlnet_streaming_golden():
    """Reference ControlNet (controlnet.py:496-554) feeding the reference
    CAM-fused VideoUNet (controlnet_mode=True) vs our ControlNet +
    streaming_wrapper composition — the full streaming denoise net."""
    from models.control.controlnet import ControlNet as RefControlNet
    from models.diffusion.video_model import VideoUNet as RefVideoUNet

    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet

    cfg = VideoUNetConfig.tiny(controlnet_mode=True)
    ccfg = ControlNetConfig.tiny()
    B, T, FC, H, W, L = 1, 4, 2, 8, 8, 1
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)

    ref_u = RefVideoUNet(
        num_conditional_frames=FC, controlnet_mode=True,
        merging_mode=cfg.merging_mode, **_ref_unet_kwargs(cfg)
    )
    ref_c = RefControlNet(
        conditioning_embedding_out_channels=list(
            ccfg.conditioning_embedding_out_channels),
        downsample_controlnet_cond=ccfg.downsample_controlnet_cond,
        use_image_encoder_normalization=ccfg.use_image_encoder_normalization,
        condition_encoder=ccfg.condition_encoder,
        frame_expansion="none",
        **_ref_unet_kwargs(cfg),
    )
    # Two reference hard-codings are only valid at production width and
    # break its own net at tiny width; rebuild those submodules with the
    # reference's own classes at the test width:
    # 1. CAM mergers hardwire attention_head_dim=64 (conditioning.py:104)
    #    -> 0 heads at 32 channels.  Our CAM uses min(64, C), identical at
    #    production widths (video_unet.py:149).
    from models.cam.conditioning import ConditionalModel

    for i, merger in enumerate(ref_u.cross_attention_merger_input_blocks):
        ch = merger.temporal_transformer.proj_in.in_features
        ref_u.cross_attention_merger_input_blocks[i] = ConditionalModel(
            input_channels=ch, conditional_model="cross_attention",
            attention_head_dim=min(64, ch))
    ch = ref_u.cross_attention_merger_mid_block.temporal_transformer \
        .proj_in.in_features
    ref_u.cross_attention_merger_mid_block = ConditionalModel(
        input_channels=ch, conditional_model="cross_attention",
        attention_head_dim=min(64, ch))
    # 2. The cond-embedding output is hardcoded at 320 channels
    #    (controlnet.py:443-446).
    from models.control.controlnet import ControlNetConditioningEmbedding

    ref_c.controlnet_cond_embedding = ControlNetConditioningEmbedding(
        conditioning_embedding_channels=cfg.model_channels,
        conditioning_channels=3,
        block_out_channels=list(ccfg.conditioning_embedding_out_channels),
        downsample=ccfg.downsample_controlnet_cond,
        use_normalization=ccfg.use_image_encoder_normalization,
    )
    rng = np.random.RandomState(3)
    u_sd = _randomize(ref_u, rng)
    c_sd = _randomize(ref_c, rng)

    x = rng.randn(B, T, H, W, cfg.in_channels).astype(np.float32)
    t_cont = np.asarray([0.4], np.float32)
    ctx = rng.randn(B, T, L, cfg.context_dim).astype(np.float32)
    y = rng.randn(B, T, cfg.adm_in_channels).astype(np.float32)
    pix = rng.randn(B, FC, H * scale, W * scale, 3).astype(np.float32)

    with torch.no_grad():
        xc = torch.as_tensor(x[:, :FC]).reshape(B * FC, H, W, -1).permute(0, 3, 1, 2)
        hs_ctrl, mid_ctrl = ref_c(
            xc,
            torch.as_tensor(t_cont).repeat_interleave(FC),
            torch.as_tensor(pix).reshape(B * FC, H * scale, W * scale, 3)
            .permute(0, 3, 1, 2),
            context=torch.as_tensor(ctx[:, :FC]).reshape(B * FC, L, -1),
            y=torch.as_tensor(y[:, :FC]).reshape(B * FC, -1),
            num_video_frames=FC,
            num_video_frames_conditional=FC,
            image_only_indicator=torch.zeros(B, FC),
        )
        xt = torch.as_tensor(x).reshape(B * T, H, W, -1).permute(0, 3, 1, 2)
        out_ref = ref_u(
            xt,
            torch.as_tensor(t_cont).repeat_interleave(T),
            context=torch.as_tensor(ctx).reshape(B * T, L, -1),
            y=torch.as_tensor(y).reshape(B * T, -1),
            num_video_frames=T,
            num_conditional_frames=FC,
            image_only_indicator=torch.zeros(B, T),
            hs_control_input=hs_ctrl,
            hs_control_mid=mid_ctrl,
        )
    ref_np = out_ref.reshape(B, T, -1, H, W).permute(0, 1, 3, 4, 2).numpy()

    unet, cn = VideoUNet(cfg), ControlNet(cfg, ccfg)
    u_tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t_cont),
        jnp.asarray(ctx), jnp.asarray(y)
    )
    c_tmpl = jax.eval_shape(
        cn.init, jax.random.PRNGKey(1), jnp.asarray(x[:, :FC]),
        jnp.asarray(t_cont), jnp.asarray(ctx[:, :FC]), jnp.asarray(y[:, :FC]),
        jnp.asarray(pix)
    )
    u_params = _convert(
        {f"model.diffusion_model.{k}": v for k, v in u_sd.items()},
        unet_map(cfg), u_tmpl)
    c_params = _convert(
        {f"controlnet.{k}": v for k, v in c_sd.items()},
        controlnet_map(cfg, ccfg), c_tmpl)

    @jax.jit
    def fwd(x):
        hs, mid = cn.apply(
            c_params, jnp.asarray(x[:, :FC]), jnp.asarray(t_cont),
            jnp.asarray(ctx[:, :FC]), jnp.asarray(y[:, :FC]), jnp.asarray(pix)
        )
        return unet.apply(
            u_params, jnp.asarray(x), jnp.asarray(t_cont),
            jnp.asarray(ctx), jnp.asarray(y), hs_control=hs, h_control_mid=mid
        )

    out = fwd(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_np, atol=5e-4, rtol=5e-4)


def test_reference_video_decoder_golden():
    """Our temporal VideoDecoder vs the reference's own VideoDecoder
    forward (temporal_ae.py:291, conv-only time mode), weights through
    vae_video_decoder_map."""
    from models.svd.sgm.modules.autoencoding.temporal_ae import (
        VideoDecoder as RefVideoDecoder,
    )

    from streamingt2v_tpu.models.vae import VideoDecoder

    import dataclasses

    from streamingt2v_tpu.config import DTypePolicy

    # ch=32 (not tiny's 16): the reference Normalize hardcodes 32 groups
    # (model.py:53) and its own code cannot run below 32 channels.
    cfg = dataclasses.replace(VAEConfig.tiny(), ch=32)
    cfg = dataclasses.replace(cfg, dtypes=DTypePolicy.fp32())
    ref = RefVideoDecoder(
        ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
        in_channels=cfg.in_channels, resolution=32,
        z_channels=cfg.z_channels,
        video_kernel_size=list(cfg.video_kernel_size),
    )
    rng = np.random.RandomState(5)
    sd = _randomize(ref, rng)

    B, T, h, w = 1, 3, 6, 6
    z = rng.randn(B, T, h, w, cfg.z_channels).astype(np.float32)
    with torch.no_grad():
        zt = torch.as_tensor(z).reshape(B * T, h, w, -1).permute(0, 3, 1, 2)
        out_ref = ref(zt, timesteps=T)
    up = 2 ** (len(cfg.ch_mult) - 1)
    ref_np = (
        out_ref.reshape(B, T, cfg.out_ch, h * up, w * up)
        .permute(0, 1, 3, 4, 2).numpy()
    )

    dec = VideoDecoder(cfg)
    dec_tmpl = jax.eval_shape(dec.init, jax.random.PRNGKey(0), jnp.asarray(z))
    tmpl = {"params": {"decoder": dec_tmpl["params"]}}
    params = _convert(
        {f"decoder.{k}": v for k, v in sd.items()},
        vae_video_decoder_map(cfg), tmpl)
    out = jax.jit(dec.apply)({"params": params["params"]["decoder"]},
                             jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out), ref_np, atol=5e-4, rtol=5e-4)


def test_reference_i2vgen_unet_golden():
    """Our I2VGenXLUNet vs the reference's own forward
    (i2v_enhance/unet_i2vgen_xl.py:159,573), weights through
    i2vgen_unet_map."""
    from i2v_enhance.unet_i2vgen_xl import I2VGenXLUNet as RefI2VGenXLUNet

    from streamingt2v_tpu.models.enhance.unet import (
        I2VGenXLUNet,
        I2VGenXLUNetConfig,
    )
    from streamingt2v_tpu.utils.checkpoint_diffusers import i2vgen_unet_map

    cfg = I2VGenXLUNetConfig.tiny()
    nblk = len(cfg.block_out_channels)
    ref = RefI2VGenXLUNet(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        down_block_types=("CrossAttnDownBlock3D",) * (nblk - 1) + ("DownBlock3D",),
        up_block_types=("UpBlock3D",) + ("CrossAttnUpBlock3D",) * (nblk - 1),
        block_out_channels=tuple(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        norm_num_groups=cfg.norm_num_groups,
        cross_attention_dim=cfg.cross_attention_dim,
        attention_head_dim=cfg.attention_head_dim,
        num_attention_heads=None,
    )
    rng = np.random.RandomState(9)
    sd = _randomize(ref, rng)

    B, T, h, w = 1, 2, 8, 8
    x = rng.randn(B, T, h, w, cfg.in_channels).astype(np.float32)
    img_lat = rng.randn(B, T, h, w, 4).astype(np.float32)
    img_emb = rng.randn(B, cfg.cross_attention_dim).astype(np.float32)
    text = rng.randn(B, 5, cfg.cross_attention_dim).astype(np.float32)
    tstep = np.asarray([37], np.int64)
    fps = np.asarray([7], np.int64)

    with torch.no_grad():
        out_ref = ref(
            torch.as_tensor(x).permute(0, 4, 1, 2, 3),
            torch.as_tensor(tstep)[0],
            fps=torch.as_tensor(fps),
            image_latents=torch.as_tensor(img_lat).permute(0, 4, 1, 2, 3),
            image_embeddings=torch.as_tensor(img_emb),
            encoder_hidden_states=torch.as_tensor(text),
            return_dict=False,
        )[0]
    ref_np = out_ref.permute(0, 2, 3, 4, 1).numpy()

    unet = I2VGenXLUNet(cfg)
    tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(tstep.astype(np.int32)), jnp.asarray(fps, jnp.float32),
        jnp.asarray(img_lat), jnp.asarray(img_emb), jnp.asarray(text)
    )
    params = _convert(sd, i2vgen_unet_map(cfg), tmpl)
    out = jax.jit(unet.apply)(
        params, jnp.asarray(x), jnp.asarray(tstep.astype(np.int32)),
        jnp.asarray(fps, jnp.float32), jnp.asarray(img_lat),
        jnp.asarray(img_emb), jnp.asarray(text)
    )
    np.testing.assert_allclose(np.asarray(out), ref_np, atol=5e-4, rtol=5e-4)
