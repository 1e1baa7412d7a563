"""Full 3-stage driver: i2v -> enhance -> interpolate -> mp4.

Rebuild of the reference `StreamingPipeline`
(inference_i2v.py:51-259): per input image, stage 1 generates
(num_frames+1)//2 frames at 576x1024, stage 2 SDEdit-enhances to
1280x720 (optionally with randomized blending), stage 3 2x-interpolates
to num_frames and writes mp4 at out_fps.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import PipelineConfig
from streamingt2v_tpu.pipeline.enhance import EnhancePipeline
from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline
from streamingt2v_tpu.pipeline.streaming import Stage1Pipeline
from streamingt2v_tpu.utils import media
from streamingt2v_tpu.utils.profiling import stage_timer


class StreamingT2VPipeline:
    """End-to-end pipeline.  Stages may be None to run partial pipelines."""

    def __init__(
        self,
        cfg: PipelineConfig,
        stage1: Optional[Stage1Pipeline] = None,
        enhance: Optional[EnhancePipeline] = None,
        interpolate: Optional[InterpolatePipeline] = None,
        offload_between_stages: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.stage1 = stage1
        self.enhance = enhance
        self.interpolate = interpolate
        # per-stage finiteness of the float outputs from the LAST run —
        # the production NaN guard (uint8 conversion would mask NaNs)
        self.stage_finite: dict = {}
        # Stage-sequential HBM residency (TPU-native use_memopt,
        # utils/residency.py): with >=2 stages on ONE device, the stage
        # model sets (~14 GB bf16 at production width) cannot co-reside
        # with 720p activations in 16 GB — swap whole param trees at the
        # host-side stage boundaries.  None = auto: on iff single device
        # and more than one stage present.
        self.offload_between_stages = offload_between_stages

    def _offload_active(self) -> bool:
        if self.offload_between_stages is not None:
            return self.offload_between_stages
        import jax

        n_stages = sum(s is not None
                       for s in (self.stage1, self.enhance, self.interpolate))
        try:
            return n_stages > 1 and jax.device_count() == 1
        except Exception:
            return False

    def _make_resident(self, active: str) -> None:
        """Offload every stage except `active` (no-op unless offloading)."""
        if not self._offload_active():
            return
        # a degraded stage-1 ladder rung (image_to_video) holds its own
        # models reference — offload it alongside the primary pipe
        rung = getattr(self, "_stage1_active", None)
        stage1_pipes = [self.stage1] + ([rung] if rung is not None
                                        and rung is not self.stage1 else [])
        for name, stages in (("stage1", stage1_pipes),
                             ("enhance", [self.enhance]),
                             ("interpolate", [self.interpolate])):
            if name == active:
                continue
            for stage in stages:
                if stage is not None:
                    stage.offload_params()
        # the active stage restores lazily via its own ensure_on_device()

    def image_to_video(self, image_u8: np.ndarray, seed: Optional[int] = None) -> np.ndarray:
        """uint8 (H, W, 3) -> uint8 stage-1 video ((num_frames+1)//2, 576, 1024, 3)."""
        from streamingt2v_tpu.utils.resilience import (
            decode_chunk_ladder,
            with_oom_fallback,
        )

        cfg = self.cfg
        self._make_resident("stage1")
        img = media.resize_to_stage1(image_u8, cfg.height, cfg.width)
        x = jnp.asarray(media.to_model_range(img))
        # OOM degradation ladder: retry with halved VAE decode chunks
        # (the TPU counterpart of the reference's static use_memopt flag,
        # inference_i2v.py:143-145) instead of dying on the first OOM.
        def run_synced(p):
            v = p.image_to_video(x, cfg.stage1_frames, seed)
            # force execution inside the ladder: only host reads
            # synchronize on this platform, and without one the async OOM
            # would surface at the caller's np.asarray, past the ladder
            np.asarray(v[-1, 0, 0, 0])
            self._stage1_active = p  # remember the rung that fits
            return v

        # ladder pipes are built lazily INSIDE each fallback thunk: an
        # upfront list would pin the original StreamingModels (and the
        # HBM the run frees via drop_field/offload) for the whole attempt.
        # The winning rung is cached so later passes (and determinism
        # reruns, which must reuse the SAME decode chunking — it changes
        # temporal-conv windows) skip the failing compiles.
        active = getattr(self, "_stage1_active", None) or self.stage1
        with stage_timer("stage1_i2v"):
            video = with_oom_fallback(
                lambda: run_synced(active),
                *[(lambda c=c: run_synced(self.stage1.with_decode_chunk(c)))
                  for c in decode_chunk_ladder(
                      cfg.inference.decode_chunk_size // 2)]
            )
            self.stage_finite["stage1"] = bool(jnp.isfinite(video).all())
            # uint8 conversion on device + chunked readback: the tunneled
            # platform moves ~25-40 MB/s, so the f32 frames (4x the bytes,
            # and a slow path for GB-sized single buffers) stay on device
            out = media.fetch_uint8(video)
        return out

    def enhance_video(self, video_u8: np.ndarray, image_u8: np.ndarray,
                      seed: Optional[int] = None) -> np.ndarray:
        """Stage 2: upscale to (enhance.height, enhance.width) + SDEdit."""
        cfg = self.cfg.enhance
        self._make_resident("enhance")
        video = media.resize_video(video_u8, cfg.height, cfg.width)
        image = media.resize_video(image_u8[None], cfg.height, cfg.width)[0]
        # the video stays a HOST f32 array: the enhance pipeline device-puts
        # it per VAE chunk, so the full-length 720p f32 buffer never has to
        # live in HBM (or cross the tunnel as one giant transfer)
        video_f = media.to_model_range(video)
        image_f = jnp.asarray(media.to_model_range(image))
        with stage_timer("stage2_enhance"):
            if self.cfg.use_randomized_blending:
                out = self.enhance.enhance_with_keyframe_prepass(video_f, image_f, seed)
            else:
                out = self.enhance.enhance(video_f, [image_f], seed=seed,
                                           use_randomized_blending=False)
            self.stage_finite["enhance"] = bool(np.isfinite(np.asarray(out)).all()
                                                if isinstance(out, np.ndarray)
                                                else jnp.isfinite(out).all())
            out = media.fetch_uint8(out)
        return out

    def interpolate_video(self, video_u8: np.ndarray) -> np.ndarray:
        """Stage 3: 2x interpolation to num_frames."""
        self._make_resident("interpolate")
        video = media.put_unit_range(video_u8)
        with stage_timer("stage3_vfi"):
            out = self.interpolate.interpolate_video(video, self.cfg.num_frames)
            self.stage_finite["vfi"] = bool(jnp.isfinite(out).all())
            out = media.fetch_uint8(out, input_range=(0.0, 1.0))
        return out

    def run(self, image_path: str, output_path: str,
            seed: Optional[int] = None) -> np.ndarray:
        """Full product run; returns the final uint8 frames (F, H, W, 3)
        in addition to writing the mp4 — for determinism/quality checks
        on the raw frames (mp4 is lossy)."""
        image = media.load_image(image_path)
        video = self.image_to_video(image, seed)
        if self.enhance is not None:
            video = self.enhance_video(video, image, seed)
        if self.interpolate is not None:
            video = self.interpolate_video(video)
        media.save_video(output_path, video, fps=self.cfg.out_fps)
        return video

    def __call__(self, image_path: str, output_path: str,
                 seed: Optional[int] = None) -> str:
        self.run(image_path, output_path, seed)
        return output_path
