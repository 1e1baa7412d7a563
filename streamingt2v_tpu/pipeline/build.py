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


def init_jit_bf16(model, key, *args):
    """Init a flax model with f32->bf16 cast FUSED into one jitted program:
    each param's f32 RNG output feeds its convert and is freed inside the
    program, so peak HBM is ~the bf16 tree instead of f32 + bf16 (the
    eager init-then-cast form peaked at both trees live)."""
    def f(k):
        p = model.init(k, *args)
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            p)

    return jax.jit(f)(key)


def stage1_param_factory(cfg: PipelineConfig, key: jax.Array,
                         models: StreamingModels, bf16: bool = False) -> dict:
    """Per-field init thunks for the stage-1 param trees.  Calling a thunk
    (re)materializes that tree ON DEVICE from the fixed `key` split —
    bitwise-identical every call (same compiled init program, same seed).
    This is what makes dropped-params residency possible
    (utils/residency.py): offload frees HBM without a download and
    restore costs device compute instead of a multi-GB host upload."""
    k = jax.random.split(key, 8)
    unet, svd_unet = models.unet, models.svd_unet
    controlnet, vae, conditioner = models.controlnet, models.vae, models.conditioner

    t = 2  # init-time frame count (params are shape-independent)
    f = cfg.vae.downsample_factor
    h, w = cfg.height // f, cfg.width // f
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
    batch = {
        "cond_frames_without_noise": jnp.zeros((1, cfg.height, cfg.width, 3)),
        "cond_frames": jnp.zeros((1, cfg.height, cfg.width, 3)),
        "fps_id": jnp.zeros((1,)),
        "motion_bucket_id": jnp.zeros((1,)),
        "cond_aug": jnp.zeros((1,)),
    }

    # jit each init: eager flax init dispatches one program per op — at
    # ~30 ms RTT on the tunneled TPU platform that is tens of minutes for
    # the production-width trees; jitted it is seconds
    def init(model, kk, *args):
        if bf16:
            return init_jit_bf16(model, kk, *args)
        return jax.jit(model.init)(kk, *args)

    return {
        "unet_params": lambda: init(unet, k[0], x, t_cont, ctx, y),
        "svd_unet_params": lambda: init(svd_unet, k[1], x, t_cont,
                                        ctx[:, :, :1], y),
        "controlnet_params": lambda: init(controlnet, k[2], x, t_cont,
                                          ctx[:, :, :1], y, pix),
        "vae_params": lambda: jax.jit(vae.init)(
            k[3], jnp.zeros((1, 2, 32, 32, 3))),  # VAE stays f32
        "conditioner_params": lambda: init(conditioner, k[4], batch),
    }


def build_models(cfg: PipelineConfig, key: jax.Array,
                 clip_cfg: Optional[CLIPVisionConfig] = None,
                 bf16: bool = False, init: bool = True) -> StreamingModels:
    """Construct (and by default randomly initialize) all stage-1 modules.
    Checkpoint loading replaces the param pytrees afterwards
    (utils/checkpoint.py).

    bf16=True initializes each non-VAE tree directly in bfloat16 (the
    production weight dtype; the reference ships fp16 under 16-mixed
    autocast, config.yaml:8,287): the full-width f32 trees together are
    ~19 GB and cannot co-reside on a 16 GB chip.  The VAE stays f32
    (disable_first_stage_autocast, config.yaml:310).

    init=False returns the models with DROPPED param fields (lazy); pair
    with `stage1_param_factory` + `Stage1Pipeline.set_param_factory` so
    each tree materializes on first use."""
    import dataclasses

    from streamingt2v_tpu.utils.residency import DROPPED

    unet = VideoUNet(cfg.unet)
    # first chunk = plain SVD-XT: no CAM fusion and no APM
    svd_cfg = dataclasses.replace(cfg.unet, controlnet_mode=False, use_apm=False)
    svd_unet = VideoUNet(svd_cfg)
    controlnet = ControlNet(cfg.unet, cfg.controlnet)
    vae = AutoencoderKL(cfg.vae)
    if clip_cfg is None:
        clip_cfg = CLIPVisionConfig() if cfg.conditioner.use_clip else CLIPVisionConfig.tiny()
    conditioner = Conditioner(cfg.conditioner, cfg.vae, clip_cfg)

    models = StreamingModels(
        unet=unet, unet_params=DROPPED,
        controlnet=controlnet, controlnet_params=DROPPED,
        svd_unet=svd_unet, svd_unet_params=DROPPED,
        vae=vae, vae_params=DROPPED,
        conditioner=conditioner, conditioner_params=DROPPED,
    )
    if init:
        thunks = stage1_param_factory(cfg, key, models, bf16=bf16)
        models = dataclasses.replace(
            models, **{f: thunk() for f, thunk in thunks.items()})
    return models


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
                   mesh=None, bf16: bool = False,
                   lazy: bool = False) -> Stage1Pipeline:
    """lazy=True defers param init until first use (dropped-params
    residency) — single-device only; sharded builds always materialize."""
    key = jax.random.PRNGKey(seed)
    multi = mesh is not None and mesh.size > 1
    models = build_models(cfg, key, clip_cfg, bf16=bf16,
                          init=(not lazy) or multi)
    if multi:
        models = shard_stage1_models(models, mesh)
        return Stage1Pipeline(cfg, models)
    pipe = Stage1Pipeline(cfg, models)
    # random-weight trees are a pure function of `key`: register the
    # regenerating thunks so offload can drop instead of download
    # (checkpoint loaders clear this, utils/loader.py)
    pipe.set_param_factory(stage1_param_factory(cfg, key, models, bf16=bf16),
                           produced_current=not lazy)
    return pipe


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


def build_enhance_random(cfg: PipelineConfig, seed: int = 0, mesh=None,
                         lazy: bool = False):
    """Stage-2 EnhancePipeline at production width with RANDOM weights —
    the no-checkpoint counterpart of utils.loader.load_enhance_pipeline,
    for product-geometry runs in environments without the published
    ali-vilab/i2vgen-xl weights (reference inference_i2v.py:136-141 always
    downloads them; this environment has no egress).  lazy=True defers
    param init until first use (dropped-params residency)."""
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

    from streamingt2v_tpu.utils.residency import DROPPED

    ucfg = I2VGenXLUNetConfig()
    vcfg = dataclasses.replace(VAEConfig(), temporal_decoder=False)
    unet = I2VGenXLUNet(ucfg)
    vae = AutoencoderKL(vcfg, use_quant_conv=True)
    clip_v = CLIPVisionTower(CLIPVisionConfig())
    clip_t = CLIPTextTower(CLIPTextConfig())

    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    h = w = 8
    # UNet + CLIP towers init directly in bf16 (the reference loads the
    # whole i2vgen pipeline fp16, i2v_enhance_interface.py:69): their f32
    # trees cost ~5.5 GB of HBM the 38-frame 720p UNet step needs.
    # Thunks so the EnhancePipeline can drop/regenerate (residency.py).
    thunks = {
        "unet_params": lambda: init_jit_bf16(
            unet, k[0], jnp.zeros((1, 2, h, w, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
            jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1, 1024)),
            jnp.zeros((1, 77, 1024))),
        "vae_params": lambda: jax.jit(vae.init)(
            k[1], jnp.zeros((1, 64, 64, 3))),
        "clip_vision_params": lambda: init_jit_bf16(
            clip_v, k[2], jnp.zeros((1, 224, 224, 3))),
        "text_params": lambda: init_jit_bf16(
            clip_t, k[3], jnp.zeros((1, 77), jnp.int32)),
    }
    materialize = not lazy or (mesh is not None and mesh.size > 1)
    params = ({f: thunk() for f, thunk in thunks.items()} if materialize
              else {f: DROPPED for f in thunks})
    models = EnhanceModels(
        unet=unet, unet_params=params["unet_params"],
        vae=vae, vae_params=params["vae_params"],
        clip_vision=clip_v, clip_vision_params=params["clip_vision_params"],
        text_encoder=clip_t, text_params=params["text_params"],
        scheduler=DDIMScheduler(),
        tokenizer=CLIPTokenizer.synthetic(),
    )
    pipe = EnhancePipeline(cfg.enhance, models, mesh=mesh)
    if mesh is None or mesh.size == 1:
        pipe.set_param_factory(thunks, produced_current=materialize)
    return pipe


def build_product_random(cfg: PipelineConfig, seed: int = 0, mesh=None):
    """The full 3-stage product at production width with random weights —
    what the CLI --random_weights path assembles, as one call for benches
    and scripts.  All three stages are built LAZY (params dropped until
    first use): the bf16 model sets total ~12 GB and cannot all sit in
    16 GB of HBM, and because random trees are pure functions of the seed
    the stage swaps regenerate on device instead of re-uploading through
    the ~8 MB/s tunnel (pipeline/full.py + utils/residency.py)."""
    import dataclasses

    from streamingt2v_tpu.pipeline.full import StreamingT2VPipeline

    if mesh is None or mesh.size == 1:
        # single-chip = the reference's use_memopt regime: its stage-1
        # decode chunk drops 8 -> 4 (streaming_svd.py:127,389).  The
        # measured full-width decode program plans 9.3 GiB of temps at
        # cs=8 vs 4.8 at cs=4 — with ~7 GiB of stage-1 trees resident
        # only cs<=4 fits 15.75 GiB, and starting there skips a known-
        # OOM ladder rung (~3 min of failing compile per process).
        cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
            cfg.inference, decode_chunk_size=4))
    stage1 = build_pipeline(cfg, seed=seed, mesh=mesh, bf16=True, lazy=True)
    enhance = build_enhance_random(cfg, seed=seed, mesh=mesh, lazy=True)
    interp = build_interpolate_random(cfg, seed=seed, mesh=mesh, lazy=True)
    return StreamingT2VPipeline(cfg, stage1, enhance, interp)


def build_interpolate_random(cfg: PipelineConfig, seed: int = 0, mesh=None,
                             lazy: bool = False):
    """Stage-3 InterpolatePipeline with RANDOM weights — the no-checkpoint
    counterpart of utils.loader.load_interpolate_pipeline."""
    from streamingt2v_tpu.models.vfi import MultiScaleFlow
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline
    from streamingt2v_tpu.utils.residency import DROPPED

    model = MultiScaleFlow(cfg.vfi)
    img = jnp.zeros((1, 64, 64, 3))
    key = jax.random.PRNGKey(seed)
    thunk = lambda: jax.jit(model.init)(key, img, img)  # noqa: E731
    materialize = not lazy or (mesh is not None and mesh.size > 1)
    params = thunk() if materialize else DROPPED
    pipe = InterpolatePipeline(model, params, tta=cfg.vfi.tta, mesh=mesh)
    if mesh is None or mesh.size == 1:
        pipe.set_param_factory(thunk, produced_current=materialize)
    return pipe
