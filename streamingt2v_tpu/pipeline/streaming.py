"""Stage 1 — streaming image-to-video.

Rebuild of the reference orchestration (diffusion_trainer/streaming_svd.py):

  1. First 25-frame chunk from the input image with the SVD-XT weights
     (the reference calls the diffusers StableVideoDiffusionPipeline,
     streaming_svd.py:388-390; here the same VideoUNet architecture with
     controlnet_mode=False runs under our EulerEDM sampler).
  2. Autoregressive chunks: each conditioned on the CLIP+VAE encoding of
     chunk 0's anchor frame (frame `anchor_frames`, streaming_svd.py:335)
     and on the last `num_conditional_frames` frames of the previous chunk
     through the ControlNet/CAM branch (streaming_svd.py:293-356).
     Frames [num_conditional_frames:] of each generation are kept.

Each chunk generation is ONE jitted program: conditioner -> 30-step
sampler scan -> chunked temporal VAE decode.  The Python-level loop over
generations re-enters the same compiled function (shapes are static), so
compilation happens once per chunk kind (first / streaming).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import PipelineConfig
from streamingt2v_tpu.diffusion import denoise, make_sampler
from streamingt2v_tpu.diffusion.guiders import make_guider
from streamingt2v_tpu.models.conditioner import Conditioner, broadcast_cond
from streamingt2v_tpu.models.controlnet import ControlNet
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.models.video_unet import VideoUNet
from streamingt2v_tpu.models.wrappers import openai_wrapper, streaming_wrapper
from streamingt2v_tpu.utils.rng import generation_key


@dataclasses.dataclass
class StreamingModels:
    """Explicit model registry — the typed replacement for the reference's
    reflective GenericModuleLoader (modules/loader/module_loader.py:58-233)."""

    unet: VideoUNet                 # streaming UNet (controlnet_mode=True)
    unet_params: Any
    controlnet: ControlNet
    controlnet_params: Any
    svd_unet: VideoUNet             # first-chunk SVD-XT (controlnet_mode=False)
    svd_unet_params: Any
    vae: AutoencoderKL              # first stage (temporal decoder)
    vae_params: Any
    conditioner: Conditioner
    conditioner_params: Any


class Stage1Pipeline:
    def __init__(self, cfg: PipelineConfig, models: StreamingModels):
        self.cfg = cfg
        self.models = models
        self._first_chunk_fn = jax.jit(self._first_chunk_impl)
        self._stream_chunk_fn = jax.jit(self._stream_chunk_impl)
        # Conditioning is a SEPARATE program from the samplers (mirrors
        # the decode split below): the conditioner tree (~1.2 GiB CLIP +
        # VAE-encoder) and its temps then never co-plan with the 6.3 GiB
        # sampler scan, and the per-program host syncs in image_to_video
        # localize any device failure to conditioning / sampling / decode.
        self._cond_fn = jax.jit(self._cond_impl)
        # VAE decode is a SEPARATE program from the samplers: fused into
        # the 30-step chunk program, XLA schedules the unrolled decode
        # chunks' 576x1024 f32 temps concurrently with sampler state and
        # the full-width program plans ~29.5 GB of HBM (compile-time OOM
        # on the 16 GB chip).  As its own per-chunk program the peak is
        # one decode chunk (reference decode_first_stage chunking,
        # streaming_svd.py:205-213).
        self._decode_chunk_fn = jax.jit(self._decode_chunk_impl)

    # ---------- conditioning ----------

    def _build_batch(self, anchor_frame: jax.Array, key: jax.Array):
        """get_batch_sgm equivalent (streaming_svd.py:169-183).  The noise
        augmentation uses UNIFORM noise, matching the reference's
        torch.rand_like (streaming_svd.py:176)."""
        inf = self.cfg.inference
        b = anchor_frame.shape[0]
        noise = jax.random.uniform(key, anchor_frame.shape, anchor_frame.dtype)
        return {
            "cond_frames_without_noise": anchor_frame,
            "cond_frames": anchor_frame + inf.cond_aug * noise,
            "fps_id": jnp.full((b,), float(inf.fps_id)),
            "motion_bucket_id": jnp.full((b,), float(inf.motion_bucket_id)),
            "cond_aug": jnp.full((b,), inf.cond_aug),
        }

    # ---------- chunk generators (jitted; params flow through jit args
    # rather than closures so they are not captured as constants) ----------

    def _sample_latents(self, network_fn, shape, cond, uc, key, sampler_cfg=None):
        sampler = make_sampler(sampler_cfg or self.cfg.sampler)

        def denoise_fn(x, sigma, c):
            return denoise(network_fn, x, sigma, c)

        k_init, k_loop = jax.random.split(key)
        noise = jax.random.normal(k_init, shape, jnp.float32)
        return sampler(denoise_fn, noise, cond, uc, key=k_loop)

    def _latent_shape(self, num_frames: int):
        cfg = self.cfg
        f = cfg.vae.downsample_factor
        return (1, num_frames, cfg.height // f, cfg.width // f, cfg.unet.out_channels)

    def _cond_impl(self, cond_params, anchor_frame, key, apm_frames=None):
        """Conditioning program: anchor (1, H, W, 3) -> (c, uc) dicts."""
        return self._conditioning_with(cond_params, anchor_frame, key,
                                       self.cfg.inference.chunk_frames,
                                       apm_frames=apm_frames)

    def _first_chunk_impl(self, svd_params, c, uc, key):
        """(c, uc) conditioning -> latents (1, T, h, w, 4)."""
        num_frames = self.cfg.inference.chunk_frames
        net = openai_wrapper(self.models.svd_unet, svd_params)
        return self._sample_latents(net, self._latent_shape(num_frames), c, uc,
                                    key,
                                    sampler_cfg=self.cfg.first_chunk_sampler)

    def _stream_chunk_impl(self, unet_params, cn_params, c, uc, key):
        """(c, uc) with ctrl_frames merged -> latents (1, T, h, w, 4)."""
        m = self.models
        num_frames = self.cfg.inference.chunk_frames
        f_cond = self.cfg.inference.num_conditional_frames
        net = streaming_wrapper(m.unet, unet_params, m.controlnet, cn_params, f_cond,
                                ctrl_cfg_shared=True)
        return self._sample_latents(net, self._latent_shape(num_frames), c, uc,
                                    key)

    def _conditioning_with(self, cond_params, anchor_frame, key, num_frames,
                           apm_frames=None):
        m = self.models
        batch = self._build_batch(anchor_frame, key)
        c, uc = m.conditioner.apply(cond_params, batch, method=Conditioner.pair)
        if apm_frames is not None:
            # 16+1 APM context: [SVD pooled token ‖ anchor-frame tokens]
            # (reference attention.py:604; uc stays forced-zero)
            tokens = m.conditioner.apply(cond_params, apm_frames,
                                         method=Conditioner.encode_frames)
            c = dict(c)
            uc = dict(uc)
            c["crossattn"] = jnp.concatenate([c["crossattn"], tokens], axis=1)
            uc["crossattn"] = jnp.concatenate(
                [uc["crossattn"], jnp.zeros_like(tokens)], axis=1)
        return broadcast_cond(c, num_frames), broadcast_cond(uc, num_frames)

    @staticmethod
    def _sync(tree) -> None:
        """Complete all in-flight programs feeding `tree` with one tiny
        host read (block_until_ready does not synchronize on the tunneled
        platform; the read costs one ~30 ms RTT)."""
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(leaf.reshape(-1)[0])

    def _decode_chunk_impl(self, vae_params, z):
        """One decode-chunk program: z (1, <=cs, h, w, 4) -> video frames.

        With `vae_decode_bf16` the params are cast to bf16 inside the
        program (one ~100 MB pass over the decoder tree, vs ~halving the
        multi-GB activation traffic of the 576x1024 tower) and the output
        is returned in f32 after an f32 clip."""
        if self.cfg.inference.vae_decode_bf16:
            vae_params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, vae_params)
            z = z.astype(jnp.bfloat16)
        out = self.models.vae.apply(vae_params, z, method=AutoencoderKL.decode)
        return jnp.clip(out.astype(jnp.float32), -1.0, 1.0)

    def _decode_video(self, vae_params, z):
        """Chunked temporal-VAE decode, one compiled program per DISTINCT
        chunk length (at most two: cs and the remainder).  Chunks run as
        separate dispatches so only one chunk's 576x1024 decoder temps are
        ever planned at once."""
        t = z.shape[1]
        cs = self.cfg.inference.decode_chunk_size
        outs = []
        for start in range(0, t, cs):
            outs.append(self._decode_chunk_fn(vae_params, z[:, start:start + cs]))
        return jnp.concatenate(outs, axis=1)

    # ---------- HBM residency (utils.residency) ----------

    _PARAM_FIELDS = ("unet_params", "controlnet_params", "svd_unet_params",
                     "vae_params", "conditioner_params")

    # Regenerable params (utils/residency.py): when the trees are a pure
    # function of the build seed (random-weight product/bench runs), the
    # builder registers per-field init thunks here.  Offload then DROPS
    # the device references (frees HBM with no download) and restore
    # re-runs the compiled init programs (seconds) instead of uploading
    # multi-GB trees through the ~8 MB/s tunnel.  Per-field bookkeeping
    # lives in utils.residency.FieldResidency so mixed states (one tree
    # checkpoint-replaced, the rest regenerable) stay correct.

    @property
    def _residency(self):
        from streamingt2v_tpu.utils.residency import FieldResidency

        r = getattr(self, "_residency_mgr", None)
        if r is None:
            r = self._residency_mgr = FieldResidency(self._PARAM_FIELDS)
        return r

    def set_param_factory(self, thunks: dict, produced_current: bool = True) -> None:
        """`thunks`: {field: () -> tree} regenerating each param tree
        bitwise-identically.  produced_current=True asserts the CURRENT
        trees came from these thunks (so offload may drop them).
        Checkpoint loaders must clear the factory (utils/loader.py)."""
        self._residency.set_factory(
            thunks,
            {f: getattr(self.models, f) for f in thunks}
            if produced_current else None)

    def offload_params(self) -> None:
        """Move all model params off HBM, freeing it for another stage;
        restored lazily by `ensure_on_device` (the TPU-native use_memopt —
        see utils/residency.py).  Factory-produced trees are dropped;
        anything else is copied to host RAM (cached per field, so repeat
        offloads never re-download through the ~12-23 MB/s tunnel)."""
        self.models = dataclasses.replace(self.models, **self._residency.offload(
            {f: getattr(self.models, f) for f in self._PARAM_FIELDS}))

    def drop_field(self, field: str) -> None:
        """Drop ONE regenerable tree mid-stage (e.g. the first-chunk
        SVD-XT UNet once the AR loop starts — ~3 GB of bf16 HBM the rest
        of stage 1 never touches).  No-op for non-factory trees."""
        self.models = dataclasses.replace(self.models, **{
            field: self._residency.drop(field, getattr(self.models, field))})

    def ensure_on_device(self) -> None:
        self.models = dataclasses.replace(self.models, **self._residency.restore(
            {f: getattr(self.models, f) for f in self._PARAM_FIELDS}))

    # ---------- degradation (utils.resilience OOM ladder) ----------

    def with_decode_chunk(self, decode_chunk_size: int) -> "Stage1Pipeline":
        """A copy of this pipeline with a smaller VAE decode chunk — the
        next rung of the OOM degradation ladder (re-jits on first use)."""
        cfg = dataclasses.replace(
            self.cfg,
            inference=dataclasses.replace(
                self.cfg.inference, decode_chunk_size=decode_chunk_size
            ),
        )
        pipe = Stage1Pipeline(cfg, self.models)
        # share the residency manager (models are shared, so the
        # factory-identity and host-cache bookkeeping transfer verbatim)
        pipe._residency_mgr = self._residency
        return pipe

    # ---------- public API ----------

    def image_to_video(self, image: jax.Array, num_frames: Optional[int] = None,
                       seed: Optional[int] = None) -> jax.Array:
        """image: (H, W, 3) in [-1,1] -> (F, H, W, 3) in [-1,1].

        `num_frames` is the stage-1 target ((pipeline num_frames+1)//2,
        reference inference_i2v.py:249)."""
        cfg = self.cfg
        self.ensure_on_device()
        m = self.models
        inf = cfg.inference
        seed = cfg.seed if seed is None else seed
        target = num_frames if num_frames is not None else cfg.stage1_frames
        n_gen = cfg.n_autoregressions(target)

        image = image[None]  # batch of 1
        k_cond, k_sample = jax.random.split(
            generation_key(seed, 0, inf.reset_seed_per_generation))
        c, uc = self._cond_fn(m.conditioner_params, image, k_cond)
        self._sync(c)
        z0 = self._first_chunk_fn(m.svd_unet_params, c, uc, k_sample)
        # The SVD-XT tree (~2.8 GiB bf16) is dead weight for the rest of
        # the stage — drop it if regenerable BEFORE the decode dispatches,
        # so their 576x1024 f32 temps get its HBM.  The host read first
        # completes the in-flight first-chunk program (only host reads
        # synchronize on the tunneled platform); the `m` refresh matters:
        # the local StreamingModels would otherwise keep the dropped tree
        # referenced (and its buffers alive) for the whole AR loop.
        self._sync(z0)
        self.drop_field("svd_unet_params")
        m = self.models
        chunk0 = self._decode_video(m.vae_params, z0)
        chunks: List[jax.Array] = [chunk0]
        anchor = chunk0[:, inf.anchor_frames]  # frame 6 of chunk 0, fixed
        use_apm = cfg.unet.use_apm
        for g in range(n_gen):
            ctrl = chunks[-1][:, -inf.num_conditional_frames:]
            k_cond, k_sample = jax.random.split(
                generation_key(seed, g + 1, inf.reset_seed_per_generation))
            if use_apm:
                # appearance anchors from the so-far video (reference
                # extract_anchor_frames on cat(result_chunks),
                # streaming_svd.py:320-323); pad by repetition if short.
                # Frame indices are resolved on the host against the chunk
                # list so every device op here has a static shape — no
                # growing concatenate is materialized per generation, and
                # _stream_chunk_fn keeps its single compiled executable
                # (pinned by test_pipeline_stage1.py::test_apm_no_retrace).
                a, b = inf.apm_anchor_frames
                lens = [c.shape[1] for c in chunks]
                starts = np.cumsum([0] + lens)
                total = int(starts[-1])
                frames = []
                for i in range(a, b):
                    gi = i % total
                    ci = int(np.searchsorted(starts, gi, side="right")) - 1
                    frames.append(chunks[ci][:, gi - int(starts[ci])])
                apm_frames = jnp.stack(frames, axis=1)
                c, uc = self._cond_fn(m.conditioner_params, anchor, k_cond,
                                      apm_frames)
            else:
                c, uc = self._cond_fn(m.conditioner_params, anchor, k_cond)
            c = dict(c)
            uc = dict(uc)
            c["ctrl_frames"] = ctrl
            uc["ctrl_frames"] = ctrl
            self._sync(c)
            z = self._stream_chunk_fn(m.unet_params, m.controlnet_params,
                                      c, uc, k_sample)
            self._sync(z)
            result = self._decode_video(m.vae_params, z)
            # Serialize generations with one tiny host read: at production
            # width the chip runs near its HBM ceiling, and a fully async
            # queue of sampler+decode programs turns a recoverable
            # RESOURCE_EXHAUSTED into a mid-flight allocation failure that
            # kills the TPU worker process (observed on v5e, round 5).
            self._sync(result)
            chunks.append(result[:, inf.num_conditional_frames:])
        video = jnp.concatenate(chunks, axis=1)[0]
        return video[:target]
