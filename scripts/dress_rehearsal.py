"""Production-width checkpoint-conversion dress rehearsal (VERDICT r3 #5).

For every weight source the pipeline loads (inference_i2v.py:133-141 and
i2v_enhance_interface.py:36-66), synthesize a FULL-SIZE state dict whose
keys come from the most authoritative torch-side source available:

  source                    torch-side key source
  ------------------------  ------------------------------------------------
  StreamingSVD UNet+CAM     reference models/diffusion/video_model.py:88
  StreamingSVD ControlNet   reference models/control/controlnet.py:124
  temporal VAE              reference sgm Encoder (model.py:487) +
                            VideoDecoder (temporal_ae.py:291)
  cond-VAE encoder          reference sgm Encoder + quant convs
  i2vgen-xl UNet            reference i2v_enhance/unet_i2vgen_xl.py:159
  i2vgen-xl CLIP text/img   transformers CLIPTextModel/CLIPVisionModel
  EMA-VFI                   reference thirdparty/VFI (Trainer.py:14 net)
  SVD-XT UNet (diffusers)   mapping-derived shapes (no diffusers in env —
  i2vgen-xl VAE (diffusers)  shape/coverage-level check only)

then run the converters end-to-end at production widths, assert zero
missing params / zero unconsumed reference keys / zero shape mismatches,
and run one forward step from the loaded params (full channel widths,
small spatial/temporal extents so CPU finishes).  Passing means the day
real weights arrive, loading is a no-op.

Runs on CPU only — does not touch the TPU.

Usage: python scripts/dress_rehearsal.py [--only a,b,...]
  components: streaming_pair temporal_vae cond_encoder i2vgen_unet
              hf_clip vfi mapping_only
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from _reference_import import install_shims  # noqa: E402

install_shims()

import torch  # noqa: E402

from streamingt2v_tpu.config import (  # noqa: E402
    ControlNetConfig,
    VAEConfig,
    VFIConfig,
    VideoUNetConfig,
)
from streamingt2v_tpu.utils import checkpoint as ck  # noqa: E402
from streamingt2v_tpu.utils import checkpoint_diffusers as ckd  # noqa: E402


def _sd(module: torch.nn.Module, scale: float = 0.02) -> dict:
    """Module state dict -> small-random numpy (values irrelevant; the
    rehearsal checks names/shapes/transforms and forward finiteness)."""
    rng = np.random.RandomState(0)
    out = {}
    for k, v in module.state_dict().items():
        if not v.dtype.is_floating_point:
            continue
        w = (rng.randn(*v.shape) * scale).astype(np.float32)
        if k.endswith(".weight") and v.ndim == 1:
            w += 1.0
        out[k] = w
    return out


def _convert_checked(sd, mapping, tmpl, allow_orphans=()):
    """convert (strict: any missing mapping/shape mismatch raises) + check
    every synthesized reference key is consumed, modulo allow_orphans
    substrings (keys the pipeline legitimately never loads)."""
    params, missing = ck.convert_state_dict(sd, mapping, tmpl)
    assert not missing, missing[:5]
    used = set()
    for tk, _t in mapping.values():
        used.update(tk if isinstance(tk, tuple) else (tk,))
    orphans = [k for k in sd if k not in used
               and not any(s in k for s in allow_orphans)]
    assert not orphans, f"reference keys not consumed: {orphans[:10]}"
    return params


def _n_params(tree) -> float:
    return sum(int(np.prod(np.shape(a))) for a in jax.tree.leaves(tree)) / 1e9


def run_streaming_pair() -> str:
    """StreamingSVD UNet+CAM (1.59B) + ControlNet (0.67B), sgm layout, and
    one streaming denoise forward from the loaded params."""
    sys.path.insert(0, "/root/reference/code")
    from models.control.controlnet import ControlNet as RefControlNet
    from models.diffusion.video_model import VideoUNet as RefVideoUNet
    from test_reference_goldens import _ref_unet_kwargs

    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper

    cfg = VideoUNetConfig()
    ccfg = ControlNetConfig()
    FC = ccfg.num_conditional_frames

    with torch.no_grad():
        ref_u = RefVideoUNet(num_conditional_frames=FC, controlnet_mode=True,
                             merging_mode=cfg.merging_mode, **_ref_unet_kwargs(cfg))
        u_sd = {f"model.diffusion_model.{k}": v for k, v in _sd(ref_u).items()}
        del ref_u
        gc.collect()
        ref_c = RefControlNet(
            conditioning_embedding_out_channels=list(
                ccfg.conditioning_embedding_out_channels),
            downsample_controlnet_cond=ccfg.downsample_controlnet_cond,
            use_image_encoder_normalization=ccfg.use_image_encoder_normalization,
            condition_encoder=ccfg.condition_encoder,
            frame_expansion="none",
            **_ref_unet_kwargs(cfg),
        )
        c_sd = {f"controlnet.{k}": v for k, v in _sd(ref_c).items()}
        del ref_c
        gc.collect()

    unet, cn = VideoUNet(cfg), ControlNet(cfg, ccfg)
    B, T, H, W = 1, 4, 16, 16
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)
    x = jnp.zeros((B, T, H, W, cfg.in_channels))
    t0 = jnp.zeros((1,))
    ctx = jnp.zeros((B, T, 1, cfg.context_dim))
    y = jnp.zeros((B, T, cfg.adm_in_channels))
    pix = jnp.zeros((B, 2, H * scale, W * scale, 3))
    u_tmpl = jax.eval_shape(unet.init, jax.random.PRNGKey(0), x, t0, ctx, y)
    c_tmpl = jax.eval_shape(cn.init, jax.random.PRNGKey(1), x[:, :2], t0,
                            ctx[:, :2], y[:, :2], pix)

    u_params = _convert_checked(u_sd, ck.unet_map(cfg), u_tmpl)
    del u_sd
    gc.collect()
    c_params = _convert_checked(c_sd, ck.controlnet_map(cfg, ccfg), c_tmpl)
    del c_sd
    gc.collect()
    nu, nc = _n_params(u_params), _n_params(c_params)

    net = streaming_wrapper(unet, u_params, cn, c_params, 2)
    rng = np.random.RandomState(1)
    out = jax.jit(net)(
        jnp.asarray(rng.randn(B, T, H, W, 4), jnp.float32), t0,
        {"concat": jnp.asarray(rng.randn(B, T, H, W, 4), jnp.float32),
         "crossattn": jnp.asarray(rng.randn(B, T, 1, cfg.context_dim), jnp.float32),
         "vector": jnp.asarray(rng.randn(B, T, cfg.adm_in_channels), jnp.float32),
         "ctrl_frames": jnp.asarray(rng.randn(B, 2, H * scale, W * scale, 3),
                                    jnp.float32)},
    )
    assert np.isfinite(np.asarray(out)).all() and out.shape == (B, T, H, W, 4)
    return f"UNet {nu:.3f}B + ControlNet {nc:.3f}B converted, denoise forward finite"


def run_temporal_vae() -> str:
    """first_stage_model: sgm Encoder + temporal VideoDecoder at ch=128."""
    from models.svd.sgm.modules.autoencoding.temporal_ae import (
        VideoDecoder as RefVideoDecoder,
    )
    from models.svd.sgm.modules.diffusionmodules.model import Encoder as RefEncoder

    from streamingt2v_tpu.models.vae import AutoencoderKL

    cfg = VAEConfig()
    with torch.no_grad():
        enc = RefEncoder(
            ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
            num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
            in_channels=cfg.in_channels, resolution=256,
            z_channels=cfg.z_channels, double_z=cfg.double_z,
        )
        dec = RefVideoDecoder(
            ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
            num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
            in_channels=cfg.in_channels, resolution=256,
            z_channels=cfg.z_channels,
            video_kernel_size=list(cfg.video_kernel_size),
        )
        sd = {f"first_stage_model.encoder.{k}": v for k, v in _sd(enc).items()}
        sd.update({f"first_stage_model.decoder.{k}": v for k, v in _sd(dec).items()})
        del enc, dec
        gc.collect()

    vae = AutoencoderKL(cfg)
    video = jnp.zeros((1, 2, 64, 64, 3))
    tmpl = jax.eval_shape(vae.init, jax.random.PRNGKey(0), video)
    params = _convert_checked(sd, ck.vae_map(cfg), tmpl)
    rng = np.random.RandomState(2)
    out = jax.jit(vae.apply)(
        params, jnp.asarray(rng.randn(1, 2, 64, 64, 3), jnp.float32),
        jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()
    return f"VAE {_n_params(params):.3f}B converted, round-trip finite"


def run_cond_encoder() -> str:
    """conditioner.embedders.3: sgm Encoder + quant convs (mode-only KL);
    decoder keys present in the checkpoint are legitimately unused."""
    import dataclasses

    from models.svd.sgm.modules.diffusionmodules.model import Encoder as RefEncoder

    from streamingt2v_tpu.models.vae import AutoencoderKL

    cfg = dataclasses.replace(VAEConfig(), temporal_decoder=False,
                              scale_factor=1.0)
    with torch.no_grad():
        enc = RefEncoder(
            ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
            num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
            in_channels=cfg.in_channels, resolution=256,
            z_channels=cfg.z_channels, double_z=cfg.double_z,
        )
        pfx = "conditioner.embedders.3.encoder"
        sd = {f"{pfx}.encoder.{k}": v for k, v in _sd(enc).items()}
        del enc
        gc.collect()
    # AutoencodingEngineLegacy quant convs (autoencoder.py:437-465)
    rng = np.random.RandomState(3)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    ec = 2 * cfg.embed_dim if cfg.double_z else cfg.embed_dim
    sd[f"{pfx}.quant_conv.weight"] = rng.randn(ec, zc, 1, 1).astype(np.float32) * 0.02
    sd[f"{pfx}.quant_conv.bias"] = np.zeros((ec,), np.float32)

    vae = AutoencoderKL(cfg, use_quant_conv=True)
    tmpl = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)))
    enc_tmpl = {"params": {k: v for k, v in tmpl["params"].items()
                           if k in ("encoder", "quant_conv")}}
    params = _convert_checked(
        sd, ck.vae_map(cfg, torch_prefix=pfx, use_quant_conv=True), enc_tmpl)
    return f"cond encoder {_n_params(params):.3f}B converted"


def run_i2vgen_unet() -> str:
    """i2vgen-xl UNet (1.42B, the reference's own vendored module) + one
    DDIM-scale forward."""
    from i2v_enhance.unet_i2vgen_xl import I2VGenXLUNet as RefI2VGenXLUNet

    from streamingt2v_tpu.models.enhance.unet import I2VGenXLUNet, I2VGenXLUNetConfig

    cfg = I2VGenXLUNetConfig()
    nblk = len(cfg.block_out_channels)
    with torch.no_grad():
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
        sd = _sd(ref)
        del ref
        gc.collect()

    unet = I2VGenXLUNet(cfg)
    B, T, h, w = 1, 2, 16, 16
    x = jnp.zeros((B, T, h, w, cfg.in_channels))
    tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,)), jnp.zeros((B, T, h, w, 4)),
        jnp.zeros((B, cfg.cross_attention_dim)),
        jnp.zeros((B, 77, cfg.cross_attention_dim)))
    params = _convert_checked(sd, ckd.i2vgen_unet_map(cfg), tmpl)
    del sd
    gc.collect()
    rng = np.random.RandomState(4)
    out = jax.jit(unet.apply)(
        params, jnp.asarray(rng.randn(B, T, h, w, cfg.in_channels), jnp.float32),
        jnp.full((B,), 500, jnp.int32), jnp.full((B,), 16.0),
        jnp.asarray(rng.randn(B, T, h, w, 4), jnp.float32),
        jnp.asarray(rng.randn(B, cfg.cross_attention_dim), jnp.float32),
        jnp.asarray(rng.randn(B, 77, cfg.cross_attention_dim), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()
    return f"I2VGenXL UNet {_n_params(params):.3f}B converted, forward finite"


def run_hf_clip() -> str:
    """i2vgen-xl text_encoder + image_encoder: REAL transformers modules at
    the production ViT-H geometry -> authentic HF key names."""
    import transformers

    from streamingt2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from streamingt2v_tpu.models.clip_text import CLIPTextConfig, CLIPTextTower

    tcfg = CLIPTextConfig()
    vcfg = CLIPVisionConfig()
    with torch.no_grad():
        ref_t = transformers.CLIPTextModel(transformers.CLIPTextConfig(
            vocab_size=tcfg.vocab_size, hidden_size=tcfg.width,
            intermediate_size=int(tcfg.width * tcfg.mlp_ratio),
            num_hidden_layers=tcfg.layers,
            num_attention_heads=tcfg.heads,
            max_position_embeddings=tcfg.max_length,
            hidden_act="gelu", projection_dim=tcfg.width))
        t_sd = _sd(ref_t)
        del ref_t
        ref_v = transformers.CLIPVisionModelWithProjection(transformers.CLIPVisionConfig(
            hidden_size=vcfg.width,
            intermediate_size=int(vcfg.width * vcfg.mlp_ratio),
            num_hidden_layers=vcfg.layers, num_attention_heads=vcfg.heads,
            image_size=vcfg.image_size, patch_size=vcfg.patch_size,
            hidden_act="gelu", projection_dim=vcfg.output_dim))
        v_sd = _sd(ref_v)
        del ref_v
        gc.collect()

    text = CLIPTextTower(tcfg)
    t_tmpl = jax.eval_shape(text.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 77), jnp.int32))
    t_params = _convert_checked(t_sd, ckd.hf_clip_text_map(tcfg), t_tmpl,
                                allow_orphans=("position_ids",))
    out_t = jax.jit(text.apply)(t_params, jnp.ones((1, 77), jnp.int32))
    assert np.isfinite(np.asarray(out_t)).all()

    vis = CLIPVisionTower(vcfg)
    v_tmpl = jax.eval_shape(vis.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))
    v_params = _convert_checked(v_sd, ckd.hf_clip_vision_map(vcfg), v_tmpl,
                                allow_orphans=("position_ids",))
    pooled, tokens = jax.jit(vis.apply)(
        v_params, jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))
    assert np.isfinite(np.asarray(pooled)).all()
    return (f"HF CLIP text {_n_params(t_params):.3f}B + "
            f"vision {_n_params(v_params):.3f}B converted, forwards finite")


def run_vfi() -> str:
    """EMA-VFI: the reference Trainer's own net (feature_extractor +
    flow_estimation at F=32/W=7) with the published 'module.' prefix."""
    import types

    if "timm" not in sys.modules:  # reference VFI imports 3 timm helpers
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        tl.DropPath = DropPath
        tl.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        tl.trunc_normal_ = lambda t, **kw: torch.nn.init.trunc_normal_(
            t, std=kw.get("std", 1.0))
        timm.models = tm
        tm.layers = tl
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl})

    from i2v_enhance.thirdparty.VFI.config import init_model_config

    from streamingt2v_tpu.models.vfi import MultiScaleFlow
    from streamingt2v_tpu.utils.checkpoint_vfi import vfi_map

    backbonecfg, multiscalecfg = init_model_config(F=32, W=7, depth=[2, 2, 2, 4, 4])
    # model/__init__.py: feature_extractor/flow_estimation ARE the classes
    from i2v_enhance.thirdparty.VFI.model import feature_extractor, flow_estimation

    with torch.no_grad():
        net = flow_estimation(feature_extractor(**backbonecfg), **multiscalecfg)
        sd = {f"module.{k}": v for k, v in _sd(net).items()}
        # non-float buffers the published ckpt carries (Trainer strips none)
        del net
        gc.collect()

    # loader.py:253-255 key hygiene
    sd = {k[len("module."):]: v for k, v in sd.items()
          if "attn_mask" not in k and "HW" not in k}
    cfg = VFIConfig()
    model = MultiScaleFlow(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    tmpl = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)
    params = _convert_checked(sd, vfi_map(cfg), tmpl,
                              allow_orphans=("relative_position_index",))
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    mid = jax.jit(model.apply)(params, a, b)
    assert np.isfinite(np.asarray(mid)).all()
    return f"VFI {_n_params(params) * 1000:.1f}M converted, interpolation finite"


def _probe_sd_for(mapping, template, rng):
    """Synthesize torch-side arrays by PROBING each mapping transform with
    candidate shapes until transform(candidate).shape == template shape.
    Handles linear/conv2d/conv3d/identity/linear->conv1x1 and the
    concatenated-projection tuple transforms."""
    flat = ck.flatten_params(template["params"])
    sd = {}
    for fx, (tk, transform) in mapping.items():
        if fx not in flat:
            continue
        t = tuple(flat[fx].shape)
        if isinstance(tk, tuple):
            n = len(tk)
            # t_cat_linear: concat of w.T along axis 1 -> each (O/n, I);
            # t_cat_bias: concat along axis 0 -> each (O/n,)
            cands = ([(t[1] // n, t[0])] if len(t) == 2 else [(t[0] // n,)])
            done = False
            for c in cands:
                try:
                    if transform([np.zeros(c, np.float32)] * n).shape == t:
                        for k in tk:
                            sd[k] = rng.randn(*c).astype(np.float32)
                        done = True
                        break
                except Exception:  # noqa: BLE001
                    continue
            assert done, f"cannot invert tuple transform for {fx} {t}"
            continue
        cands = [t]
        if len(t) == 2:
            cands.append((t[1], t[0]))
        elif len(t) == 4:
            cands.append((t[3], t[2], t[0], t[1]))
            if t[0] == t[1] == 1:
                cands.append((t[3], t[2]))  # linear stored as 1x1 conv
        elif len(t) == 5:
            cands.append((t[4], t[3], t[0], t[1], t[2]))
        done = False
        for c in cands:
            try:
                if tuple(transform(np.zeros(c, np.float32)).shape) == t:
                    sd[tk] = rng.randn(*c).astype(np.float32)
                    done = True
                    break
            except Exception:  # noqa: BLE001
                continue
        assert done, f"cannot invert transform for {fx} {t}"
    return sd


def run_mapping_only() -> str:
    """SVD-XT UNet + diffusers SD-VAE: no torch-side module available in
    this environment (diffusers not installed, not vendored) — synthesize
    from the mapping (probe-based inverse) and convert at production width.
    Covers shapes/transforms; key NAMES for these two rest on the
    production-coverage tests."""
    import dataclasses

    from streamingt2v_tpu.models.vae import AutoencoderKL
    from streamingt2v_tpu.models.video_unet import VideoUNet

    rng = np.random.RandomState(6)
    svd_cfg = dataclasses.replace(VideoUNetConfig(), controlnet_mode=False)
    unet = VideoUNet(svd_cfg)
    x = jnp.zeros((1, 2, 16, 16, svd_cfg.in_channels))
    tmpl = jax.eval_shape(unet.init, jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                          jnp.zeros((1, 2, 1, svd_cfg.context_dim)),
                          jnp.zeros((1, 2, svd_cfg.adm_in_channels)))
    sd = _probe_sd_for(ckd.svd_unet_map(svd_cfg), tmpl, rng)
    svd_params = _convert_checked(sd, ckd.svd_unet_map(svd_cfg), tmpl)
    del sd
    gc.collect()

    vcfg = dataclasses.replace(VAEConfig(), temporal_decoder=False)
    vae = AutoencoderKL(vcfg, use_quant_conv=True)
    v_tmpl = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    v_sd = _probe_sd_for(ckd.diffusers_vae_map(vcfg), v_tmpl, rng)
    v_params = _convert_checked(v_sd, ckd.diffusers_vae_map(vcfg), v_tmpl)
    return (f"SVD-XT UNet {_n_params(svd_params):.3f}B + SD VAE "
            f"{_n_params(v_params):.3f}B converted (mapping-derived shapes)")


COMPONENTS = {
    "streaming_pair": run_streaming_pair,
    "temporal_vae": run_temporal_vae,
    "cond_encoder": run_cond_encoder,
    "i2vgen_unet": run_i2vgen_unet,
    "hf_clip": run_hf_clip,
    "vfi": run_vfi,
    "mapping_only": run_mapping_only,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    names = [n for n in args.only.split(",") if n] or list(COMPONENTS)

    failures = []
    for name in names:
        t0 = time.time()
        try:
            msg = COMPONENTS[name]()
            print(f"PASS {name} ({time.time() - t0:.0f}s): {msg}", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"FAIL {name} ({time.time() - t0:.0f}s): {e}", flush=True)
            failures.append(name)
        gc.collect()
    print(f"\n{len(names) - len(failures)}/{len(names)} components passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
