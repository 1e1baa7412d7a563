"""Model construction + initialization for the streaming pipeline.

The typed, explicit replacement for the reference's reflective module
loader (GenericModuleLoader, modules/loader/module_loader.py:58-233): each
module is built from the config tree and initialized (or loaded from a
converted checkpoint) with no string-path indirection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import PipelineConfig
from streamingt2v_tpu.models.clip import CLIPVisionConfig
from streamingt2v_tpu.models.conditioner import Conditioner
from streamingt2v_tpu.models.controlnet import ControlNet
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.models.video_unet import VideoUNet
from streamingt2v_tpu.pipeline.streaming import Stage1Pipeline, StreamingModels


def build_models(cfg: PipelineConfig, key: jax.Array,
                 clip_cfg: Optional[CLIPVisionConfig] = None,
                 bf16: bool = False) -> StreamingModels:
    """Construct and randomly initialize all stage-1 modules.  Checkpoint
    loading replaces the param pytrees afterwards (utils/checkpoint.py).

    bf16=True casts each non-VAE tree to bfloat16 IMMEDIATELY after its
    init (the production weight dtype; the reference ships fp16 under
    16-mixed autocast, config.yaml:8,287): the full-width f32 trees
    together are ~19 GB and cannot co-reside on a 16 GB chip.  The VAE
    stays f32 (disable_first_stage_autocast, config.yaml:310)."""
    import dataclasses

    k = jax.random.split(key, 8)
    unet = VideoUNet(cfg.unet)
    # first chunk = plain SVD-XT: no CAM fusion and no APM
    svd_cfg = dataclasses.replace(cfg.unet, controlnet_mode=False, use_apm=False)
    svd_unet = VideoUNet(svd_cfg)
    controlnet = ControlNet(cfg.unet, cfg.controlnet)
    vae = AutoencoderKL(cfg.vae)
    if clip_cfg is None:
        clip_cfg = CLIPVisionConfig() if cfg.conditioner.use_clip else CLIPVisionConfig.tiny()
    conditioner = Conditioner(cfg.conditioner, cfg.vae, clip_cfg)

    t = 2  # init-time frame count (params are shape-independent)
    f = cfg.vae.downsample_factor
    h, w = cfg.height // f, cfg.width // f
    f_cond = cfg.inference.num_conditional_frames
    x = jnp.zeros((1, t, h, w, cfg.unet.in_channels))
    t_cont = jnp.zeros((1,))
    # APM needs the full 16+1-token context at init (the mixer's Conv1d
    # in-channels = token count, attention.py:604-606)
    a, b = cfg.inference.apm_anchor_frames
    n_ctx = 1 + (b - a) if cfg.unet.use_apm else 1
    ctx = jnp.zeros((1, t, n_ctx, cfg.unet.context_dim))
    y = jnp.zeros((1, t, cfg.unet.adm_in_channels))
    pix_scale = 2 ** (len(cfg.controlnet.conditioning_embedding_out_channels) - 1)
    pix = jnp.zeros((1, t, h * pix_scale, w * pix_scale, 3))

    # jit each init: eager flax init dispatches one program per op — at
    # ~30 ms RTT on the tunneled TPU platform that is tens of minutes for
    # the production-width trees; jitted it is seconds
    cast = cast_params_bf16 if bf16 else (lambda t: t)
    unet_params = cast(jax.jit(unet.init)(k[0], x, t_cont, ctx, y))
    svd_params = cast(jax.jit(svd_unet.init)(k[1], x, t_cont, ctx[:, :, :1], y))
    cn_params = cast(jax.jit(controlnet.init)(k[2], x, t_cont, ctx[:, :, :1], y, pix))
    vae_params = jax.jit(vae.init)(k[3], jnp.zeros((1, 2, 32, 32, 3)))
    batch = {
        "cond_frames_without_noise": jnp.zeros((1, cfg.height, cfg.width, 3)),
        "cond_frames": jnp.zeros((1, cfg.height, cfg.width, 3)),
        "fps_id": jnp.zeros((1,)),
        "motion_bucket_id": jnp.zeros((1,)),
        "cond_aug": jnp.zeros((1,)),
    }
    cond_params = cast(jax.jit(conditioner.init)(k[4], batch))

    return StreamingModels(
        unet=unet, unet_params=unet_params,
        controlnet=controlnet, controlnet_params=cn_params,
        svd_unet=svd_unet, svd_unet_params=svd_params,
        vae=vae, vae_params=vae_params,
        conditioner=conditioner, conditioner_params=cond_params,
    )


def shard_stage1_models(models: StreamingModels, mesh) -> StreamingModels:
    """Place every param pytree on the mesh per the logical TP rules
    (projection/FF weights shard over `model`; the rest replicate).  Jitted
    pipeline calls then inherit the shardings from their inputs — no code
    changes needed in the forward functions."""
    import dataclasses

    from streamingt2v_tpu.parallel.sharding import shard_params

    return dataclasses.replace(
        models,
        unet_params=shard_params(models.unet_params, mesh),
        controlnet_params=shard_params(models.controlnet_params, mesh),
        svd_unet_params=shard_params(models.svd_unet_params, mesh),
        vae_params=shard_params(models.vae_params, mesh),
        conditioner_params=shard_params(models.conditioner_params, mesh),
    )


def build_pipeline(cfg: PipelineConfig, seed: int = 0,
                   clip_cfg: Optional[CLIPVisionConfig] = None,
                   mesh=None, bf16: bool = False) -> Stage1Pipeline:
    models = build_models(cfg, jax.random.PRNGKey(seed), clip_cfg, bf16=bf16)
    if mesh is not None and mesh.size > 1:
        models = shard_stage1_models(models, mesh)
    return Stage1Pipeline(cfg, models)


def cast_params_bf16(params):
    """f32 leaves -> bf16 as ONE jitted donated program: the eager
    per-leaf form dispatches one ~30 ms-RTT program per distinct shape on
    the tunneled platform (~700 shapes for a UNet tree)."""
    return jax.jit(
        lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
        ),
        donate_argnums=0,
    )(params)


def build_enhance_random(cfg: PipelineConfig, seed: int = 0, mesh=None):
    """Stage-2 EnhancePipeline at production width with RANDOM weights —
    the no-checkpoint counterpart of utils.loader.load_enhance_pipeline,
    for product-geometry runs in environments without the published
    ali-vilab/i2vgen-xl weights (reference inference_i2v.py:136-141 always
    downloads them; this environment has no egress)."""
    import dataclasses

    from streamingt2v_tpu.config import VAEConfig
    from streamingt2v_tpu.diffusion.ddim import DDIMScheduler
    from streamingt2v_tpu.models.clip import CLIPVisionTower
    from streamingt2v_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextTower,
        CLIPTokenizer,
    )
    from streamingt2v_tpu.models.enhance.unet import I2VGenXLUNet, I2VGenXLUNetConfig
    from streamingt2v_tpu.models.vae import AutoencoderKL
    from streamingt2v_tpu.pipeline.enhance import EnhanceModels, EnhancePipeline

    ucfg = I2VGenXLUNetConfig()
    vcfg = dataclasses.replace(VAEConfig(), temporal_decoder=False)
    unet = I2VGenXLUNet(ucfg)
    vae = AutoencoderKL(vcfg, use_quant_conv=True)
    clip_v = CLIPVisionTower(CLIPVisionConfig())
    clip_t = CLIPTextTower(CLIPTextConfig())

    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    h = w = 8
    # UNet + CLIP towers in bf16 (the reference loads the whole i2vgen
    # pipeline fp16, i2v_enhance_interface.py:69), cast right after each
    # init: their f32 params cost ~5.5 GB of HBM the 38-frame 720p UNet
    # step needs.
    u_params = cast_params_bf16(jax.jit(unet.init)(
        k[0], jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)), jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1, 1024)),
        jnp.zeros((1, 77, 1024)),
    ))
    v_params = jax.jit(vae.init)(k[1], jnp.zeros((1, 64, 64, 3)))
    cv_params = cast_params_bf16(jax.jit(clip_v.init)(
        k[2], jnp.zeros((1, 224, 224, 3))))
    ct_params = cast_params_bf16(jax.jit(clip_t.init)(
        k[3], jnp.zeros((1, 77), jnp.int32)))

    models = EnhanceModels(
        unet=unet, unet_params=u_params,
        vae=vae, vae_params=v_params,
        clip_vision=clip_v, clip_vision_params=cv_params,
        text_encoder=clip_t, text_params=ct_params,
        scheduler=DDIMScheduler(),
        tokenizer=CLIPTokenizer.synthetic(),
    )
    return EnhancePipeline(cfg.enhance, models, mesh=mesh)


def build_product_random(cfg: PipelineConfig, seed: int = 0, mesh=None):
    """The full 3-stage product at production width with random weights —
    what the CLI --random_weights path assembles, as one call for benches
    and scripts.  Stages are offloaded to host as they are built: the
    bf16 model sets total ~12 GB and cannot all sit in 16 GB of HBM while
    the next stage initializes (the product run swaps them back in
    stage-sequentially, pipeline/full.py + utils/residency.py)."""
    from streamingt2v_tpu.pipeline.full import StreamingT2VPipeline

    stage1 = build_pipeline(cfg, seed=seed, mesh=mesh, bf16=True)
    stage1.offload_params()
    enhance = build_enhance_random(cfg, seed=seed, mesh=mesh)
    enhance.offload_params()
    interp = build_interpolate_random(cfg, seed=seed, mesh=mesh)
    return StreamingT2VPipeline(cfg, stage1, enhance, interp)


def build_interpolate_random(cfg: PipelineConfig, seed: int = 0, mesh=None):
    """Stage-3 InterpolatePipeline with RANDOM weights — the no-checkpoint
    counterpart of utils.loader.load_interpolate_pipeline."""
    from streamingt2v_tpu.models.vfi import MultiScaleFlow
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline

    model = MultiScaleFlow(cfg.vfi)
    img = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), img, img)
    return InterpolatePipeline(model, params, tta=cfg.vfi.tta, mesh=mesh)
