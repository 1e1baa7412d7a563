"""streamingt2v_tpu — TPU-native streaming long-video generation framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
StreamingSVD (Picsart-AI-Research/StreamingT2V): autoregressive long-video
generation (SVD-XT + CAM conditioning), I2VGen-XL SDEdit enhancement with
randomized blending, and EMA-VFI 2x frame interpolation.

Layer map (TPU-first redesign of reference layers L0-L7, see SURVEY.md):

  ops/        - Pallas kernels + XLA compute primitives (flash attention,
                fused GroupNorm, GEGLU, temporal-conv blending, warp).
  models/     - pure-functional flax modules: VAE (spatial encoder +
                temporal video decoder), VideoUNet, ControlNet/CAM,
                conditioner & CLIP image tower, I2VGen-XL UNet, EMA-VFI.
  diffusion/  - denoiser scalings, sigma discretizations (EDM / DDPM /
                AlignYourSteps), CFG guiders, scan-compiled samplers.
  pipeline/   - the 3-stage driver (i2v -> enhance -> interpolate) and the
                autoregressive chunk scheduler.
  parallel/   - device mesh, logical-axis sharding rules, collectives.
  utils/      - checkpoint ingestion (torch state_dict -> pytree), RNG
                discipline, media I/O, profiling.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules at package
    import time)."""
    if name == "PipelineConfig":
        from streamingt2v_tpu.config import PipelineConfig

        return PipelineConfig
    if name == "build_pipeline":
        from streamingt2v_tpu.pipeline.build import build_pipeline

        return build_pipeline
    if name == "StreamingT2VPipeline":
        from streamingt2v_tpu.pipeline.full import StreamingT2VPipeline

        return StreamingT2VPipeline
    raise AttributeError(name)
