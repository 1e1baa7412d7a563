"""Three-stage StreamingT2V pipeline, end to end, on a tiny config.

Stage 1 (streaming i2v autoregression) -> stage 2 (SDEdit enhance with
randomized blending) -> stage 3 (VFI 2x interpolation) -> .y4m video.
Random weights, tiny widths: this demonstrates the WIRING, not quality.
For real output, convert the published checkpoints (utils/checkpoint.py)
and use the CLI with --ckpt_dir.

Runs on CPU or one TPU chip:  python examples/tiny_image_to_video.py
"""

import dataclasses
import os
import sys

import jax

# this environment's TPU plugin ignores the JAX_PLATFORMS env var;
# the config knob (set before backend init) is what takes effect
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamingt2v_tpu.config import EnhanceConfig, PipelineConfig
from streamingt2v_tpu.pipeline.build import build_pipeline
from streamingt2v_tpu.pipeline.full import StreamingT2VPipeline
from streamingt2v_tpu.utils import media


def main() -> None:
    # tiny() mirrors the production config tree at toy widths
    cfg = PipelineConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        enhance=EnhanceConfig(num_steps=3, height=32, width=32, chunk_size=4,
                              overlap_size=2, use_randomized_blending=True),
        use_randomized_blending=True,
    )

    stage1 = build_pipeline(cfg, seed=0)
    pipe = StreamingT2VPipeline(cfg, stage1)  # stages 2/3 need checkpoints;
    # see tests/test_e2e_determinism.py for wiring tiny random-weight
    # enhance/VFI stages explicitly.

    rng = np.random.RandomState(0)
    image = (rng.rand(48, 48, 3) * 255).astype(np.uint8)

    video = pipe.image_to_video(image, seed=33)  # uint8 (F, H, W, 3)
    out = media.save_video("tiny_demo.y4m", video, fps=cfg.out_fps)
    print(f"wrote {out}: {video.shape[0]} frames {video.shape[1]}x{video.shape[2]}")


if __name__ == "__main__":
    main()
