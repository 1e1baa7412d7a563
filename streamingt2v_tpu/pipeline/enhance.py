"""Stage 2 — I2VGen-XL enhancement (SDEdit + randomized blending).

Rebuild of the reference's modified diffusers pipeline
(i2v_enhance/pipeline_i2vgen_xl.py:619-930) and interface
(i2v_enhance_interface.py:86-138):

  - video -> VAE latents, noised at the strength-truncated first timestep
    (SDEdit, :541-615)
  - per key-frame conditioning: CLIP image embedding (center-crop-wide +
    224 bilinear resize) and VAE latent of the key frame followed by
    frame-position masks (:479-511,772-796)
  - 30 DDIM steps; with randomized blending the video is denoised in
    overlapping chunks, each conditioned on its own key frame, written
    back at a random offset within the overlap (:837-909)
  - chunk-start key frames are themselves enhanced by a pre-pass
    (:90-118)

The per-chunk random offsets derive from a counter-addressed PRNG
(fold_in(step, chunk)) so chunk scheduling is bitwise-stable across runs —
the reference uses Python's global `random` (:891-897).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import EnhanceConfig
from streamingt2v_tpu.diffusion.ddim import DDIMScheduler
from streamingt2v_tpu.models.clip import CLIPVisionTower, clip_preprocess
from streamingt2v_tpu.models.clip_text import CLIPTextTower, CLIPTokenizer
from streamingt2v_tpu.models.enhance.unet import I2VGenXLUNet
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.utils.rng import RngStream


@dataclasses.dataclass
class EnhanceModels:
    unet: I2VGenXLUNet
    unet_params: Any
    vae: AutoencoderKL            # spatial SD VAE with quant convs
    vae_params: Any
    clip_vision: CLIPVisionTower
    clip_vision_params: Any
    text_encoder: CLIPTextTower
    text_params: Any
    scheduler: DDIMScheduler
    tokenizer: Optional[CLIPTokenizer] = None


def center_crop_wide(img: jax.Array, target_wh) -> jax.Array:
    """Reference `_center_crop_wide` for (H, W, C) arrays."""
    tw, th = target_wh
    h, w = img.shape[:2]
    y0 = max(0, (h - th) // 2)
    x0 = max(0, (w - tw) // 2)
    return img[y0 : y0 + th, x0 : x0 + tw]


class EnhancePipeline:
    def __init__(self, cfg: EnhanceConfig, models: EnhanceModels, mesh=None):
        self.cfg = cfg
        self.m = models
        # Multi-chip stage 2: the (chunk x CFG-half) UNet forwards within
        # one DDIM step are independent, so with a mesh they run BATCHED
        # with the batch dim sharded over the 'data' axis (per-device
        # memory == the sequential single-chip path at data=2*n_chunks).
        # The reference has no stage-2 scaling story at all (single GPU,
        # Python chunk loop: pipeline_i2vgen_xl.py:837-909).
        self.mesh = mesh
        # stage-2 VAE precision: the reference runs the whole i2vgen
        # pipeline (incl. VAE) in fp16 (i2v_enhance_interface.py:69); bf16
        # halves the 720p decoder's live tensors so 64-frame enhance fits
        # one 16 GB chip.  Stage 1 keeps its fp32 VAE
        # (disable_first_stage_autocast) — this cast is enhance-local.
        self._vae_dtype = (jnp.bfloat16 if cfg.vae_bf16
                           and models.vae_params is not None else jnp.float32)
        from streamingt2v_tpu.utils.residency import is_dropped

        if models.vae_params is None or is_dropped(models.vae_params):
            self._vae_params = models.vae_params  # derived on first restore
        else:
            self._derive_vae_params()
        self._denoise_chunk = jax.jit(self._denoise_chunk_impl,
                                      static_argnames=("num_inference_steps",))
        # latents buffers are donated: each step consumes the previous
        # step's output, so XLA reuses the allocation instead of holding
        # input+output copies live across the 30-step loop
        self._denoise_video = jax.jit(
            self._denoise_video_impl,
            static_argnames=("num_inference_steps", "chunk_size", "stride",
                             "overlap_size", "n_chunks"),
            donate_argnames=("latents",),
        )
        self._denoise_step = jax.jit(
            self._denoise_step_impl,
            static_argnames=("num_inference_steps", "chunk_size", "stride",
                             "overlap_size", "n_chunks"),
            donate_argnames=("latents",),
        )
        # VAE encode/decode as compiled programs (one per chunk shape), not
        # eager op-by-op dispatch: XLA fuses the conv tower (fewer 720p
        # intermediates live) and the tunneled platform dispatches one
        # program instead of ~50 per chunk
        self._encode_chunk = jax.jit(
            lambda p, x, key: self.m.vae.apply(
                p, x, key, method=AutoencoderKL.encode).astype(jnp.float32))
        self._decode_chunk = jax.jit(
            lambda p, z: self.m.vae.apply(
                p, z, method=AutoencoderKL.decode).astype(jnp.float32))
        self._denoise_step_dp = jax.jit(
            self._denoise_step_dp_impl,
            static_argnames=("num_inference_steps", "chunk_size", "stride",
                             "overlap_size", "n_chunks"),
            donate_argnames=("latents",),
        )
        self._key_image_cond = jax.jit(self._key_image_cond_impl,
                                       static_argnames=("num_frames",))

    # ---------- HBM residency (utils.residency) ----------

    _PARAM_FIELDS = ("unet_params", "clip_vision_params", "text_params",
                     "vae_params")

    @property
    def _residency(self):
        from streamingt2v_tpu.utils.residency import FieldResidency

        r = getattr(self, "_residency_mgr", None)
        if r is None:
            r = self._residency_mgr = FieldResidency(self._PARAM_FIELDS)
        return r

    def set_param_factory(self, thunks: dict, produced_current: bool = True) -> None:
        """`thunks`: {field: () -> tree} regenerating each of
        _PARAM_FIELDS bitwise-identically (the bf16 `_vae_params` is
        re-derived from `vae_params` on restore)."""
        self._residency.set_factory(
            thunks,
            {f: getattr(self.m, f) for f in thunks}
            if produced_current else None)

    def _derive_vae_params(self) -> None:
        """(Re)compute the enhance-local VAE tree from m.vae_params (bf16
        cast when cfg.vae_bf16 — same policy as __init__).  Purely
        derived: offload discards it, restore re-derives (a device-side
        cast, milliseconds — never host-swapped)."""
        if self.cfg.vae_bf16 and self.m.vae_params is not None:
            self._vae_params = jax.jit(lambda t: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t,
            ))(self.m.vae_params)
        else:
            self._vae_params = self.m.vae_params

    def offload_params(self) -> None:
        """Move all stage-2 params off HBM (the TPU-native use_memopt;
        see utils/residency.py).  Restored lazily by `ensure_on_device`.
        Factory-produced trees are dropped; others copy to host RAM
        (cached per field)."""
        from streamingt2v_tpu.utils.residency import DROPPED, is_dropped, tree_is_on_host

        m = self.m
        new = self._residency.offload(
            {f: getattr(m, f) for f in self._PARAM_FIELDS})
        for f, tree in new.items():
            setattr(m, f, tree)
        if not (m.vae_params is None or is_dropped(m.vae_params)
                or tree_is_on_host(m.vae_params)):
            return
        # the derived bf16 VAE tree is recomputed on restore
        self._vae_params = (DROPPED if is_dropped(m.vae_params)
                            else m.vae_params)

    def ensure_on_device(self) -> None:
        from streamingt2v_tpu.utils.residency import is_dropped, tree_is_on_host

        m = self.m
        vae_was_off = (m.vae_params is not None
                       and (is_dropped(m.vae_params)
                            or tree_is_on_host(m.vae_params)))
        new = self._residency.restore(
            {f: getattr(m, f) for f in self._PARAM_FIELDS})
        for f, tree in new.items():
            setattr(m, f, tree)
        if vae_was_off:
            self._derive_vae_params()

    # ---------- conditioning ----------

    def encode_prompts(self, prompt: Optional[str] = None,
                       negative_prompt: Optional[str] = None) -> jax.Array:
        """-> (2, 77, width): negative ‖ positive last hidden states."""
        if self.m.tokenizer is None:
            raise ValueError("no tokenizer: pass precomputed prompt_embeds")
        prompt = self.cfg.prompt if prompt is None else prompt
        negative_prompt = self.cfg.negative_prompt if negative_prompt is None else negative_prompt
        ids = jnp.asarray(self.m.tokenizer([negative_prompt, prompt]))
        return self.m.text_encoder.apply(self.m.text_params, ids)

    # ---------- core denoise ----------

    def _denoise_chunk_impl(self, unet_params, latents_chunk, t, prompt_embeds,
                            clip_emb, image_latents, fps, *, num_inference_steps):
        """One CFG-guided DDIM step on one chunk.  latents_chunk (1,T,h,w,4).

        The CFG halves run SEQUENTIALLY (lax.map): a batched 2x38-frame
        720p I2VGenXL forward peaks past the 16 GB of one v5e chip; the
        sequential form halves activation memory at full MXU efficiency
        (38 frame-rows per call) — the TPU-native replacement for the
        reference's `use_memopt` chunked block execution
        (unet_i2vgen_xl.py:51-106)."""
        m = self.m
        t_vec = jnp.full((1,), t, jnp.int32)
        fps_vec = jnp.full((1,), fps, jnp.float32)

        def half(cond):
            pe_i, ce_i, il_i = cond
            return m.unet.apply(
                unet_params, latents_chunk, t_vec, fps_vec, il_i[None],
                ce_i[None], pe_i[None]
            )[0]

        eps_u, eps_c = jax.lax.map(
            half, (prompt_embeds, clip_emb, image_latents))
        eps = (eps_u + self.cfg.guidance_scale * (eps_c - eps_u))[None]
        return m.scheduler.step(eps, t, latents_chunk, num_inference_steps)

    def _denoise_video_impl(self, unet_params, latents, timesteps, prompt_embeds,
                            clip_embs, image_latents, offset_key, fps, *,
                            num_inference_steps, chunk_size, stride,
                            overlap_size, n_chunks):
        """The ENTIRE (steps x chunks) denoising loop as one compiled
        program: `lax.scan` over DDIM steps, `fori_loop` over blending
        chunks, randomized write-back offsets drawn on-device.  Replaces a
        Python loop that re-entered jit (and forced a host sync for the
        `int(t)` / `int(offset)` casts) once per chunk per step — ~30 x
        n_chunks round-trips at ~30ms RTT on this platform (the reference's
        loop: pipeline_i2vgen_xl.py:837-909).

        clip_embs: (n_chunks, 2, D); image_latents: (n_chunks, 2, T, h, w, 4);
        timesteps: (S,) int32.  Offsets reproduce the eager path bitwise:
        fold_in(offset_key, si, ci), zero for the first chunk.
        """
        step_impl = self._denoise_step_impl
        if self.mesh is not None and self.mesh.size > 1:
            step_impl = self._denoise_step_dp_impl

        def step_body(latents, si_t):
            si, t = si_t
            return step_impl(
                unet_params, latents, si, t, prompt_embeds, clip_embs,
                image_latents, offset_key, fps,
                num_inference_steps=num_inference_steps,
                chunk_size=chunk_size, stride=stride,
                overlap_size=overlap_size, n_chunks=n_chunks), None

        latents, _ = jax.lax.scan(
            step_body, latents,
            (jnp.arange(timesteps.shape[0], dtype=jnp.int32), timesteps),
        )
        return latents

    def _denoise_step_impl(self, unet_params, latents, si, t, prompt_embeds,
                           clip_embs, image_latents, offset_key, fps, *,
                           num_inference_steps, chunk_size, stride,
                           overlap_size, n_chunks):
        """One DDIM step over all blending chunks (fori_loop), randomized
        write-back offsets drawn on-device.  Offsets reproduce the eager
        path bitwise: fold_in(offset_key, si, ci), zero for chunk 0."""
        frame_idx = jnp.arange(chunk_size)[None, :, None, None, None]

        def chunk_body(ci, carry):
            latents, new_latents, t, si = carry
            start = ci * stride
            chunk = jax.lax.dynamic_slice_in_dim(latents, start, chunk_size, axis=1)
            denoised = self._denoise_chunk_impl(
                unet_params, chunk, t, prompt_embeds, clip_embs[ci],
                image_latents[ci], fps, num_inference_steps=num_inference_steps,
            )
            if overlap_size > 0:
                k = jax.random.fold_in(jax.random.fold_in(offset_key, si), ci)
                offset = jnp.where(
                    ci == 0, 0, jax.random.randint(k, (), 0, overlap_size)
                )
                old = jax.lax.dynamic_slice_in_dim(
                    new_latents, start, chunk_size, axis=1
                )
                denoised = jnp.where(frame_idx < offset, old, denoised)
            new_latents = jax.lax.dynamic_update_slice_in_dim(
                new_latents, denoised, start, axis=1
            )
            return (latents, new_latents, t, si)

        _, new_latents, _, _ = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (latents, latents, t, si)
        )
        return new_latents

    def _denoise_step_dp_impl(self, unet_params, latents, si, t, prompt_embeds,
                              clip_embs, image_latents, offset_key, fps, *,
                              num_inference_steps, chunk_size, stride,
                              overlap_size, n_chunks):
        """One DDIM step with every (chunk, CFG-half) UNet forward BATCHED:
        B = 2*n_chunks, batch dim sharded over the mesh 'data' axis.  Same
        math as `_denoise_step_impl` (which runs the halves sequentially to
        fit one chip); the write-back order and randomized offsets are
        identical, so the two paths agree to numerics."""
        from streamingt2v_tpu.parallel.sharding import with_sharding

        m = self.m
        mesh = self.mesh
        # gather chunks at static starts: (n_chunks, T, h, w, 4)
        chunks = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(latents, ci * stride, chunk_size, axis=1)
            for ci in range(n_chunks)], axis=0)
        # batch layout: all uncond halves, then all cond halves — matching
        # the sequential path's lax.map over (uncond, cond) conditionings
        xb = jnp.concatenate([chunks, chunks], axis=0)
        ce = jnp.concatenate([clip_embs[:, 0], clip_embs[:, 1]], axis=0)
        il = jnp.concatenate([image_latents[:, 0], image_latents[:, 1]], axis=0)
        pe = jnp.concatenate([
            jnp.broadcast_to(prompt_embeds[0][None],
                             (n_chunks,) + prompt_embeds.shape[1:]),
            jnp.broadcast_to(prompt_embeds[1][None],
                             (n_chunks,) + prompt_embeds.shape[1:]),
        ], axis=0)
        B = 2 * n_chunks
        t_vec = jnp.full((B,), t, jnp.int32)
        fps_vec = jnp.full((B,), fps, jnp.float32)

        batch_axes = ("batch", None, None, None, None)
        xb = with_sharding(xb, mesh, batch_axes)
        il = with_sharding(il, mesh, batch_axes)
        ce = with_sharding(ce, mesh, ("batch", None))
        pe = with_sharding(pe, mesh, ("batch", None, None))
        eps_all = m.unet.apply(unet_params, xb, t_vec, fps_vec, il, ce, pe)
        eps_all = with_sharding(eps_all, mesh, batch_axes)
        eps_u, eps_c = eps_all[:n_chunks], eps_all[n_chunks:]
        eps = eps_u + self.cfg.guidance_scale * (eps_c - eps_u)
        denoised_all = m.scheduler.step(eps, t, chunks, num_inference_steps)

        # sequential write-back (cheap) reproducing the fori path exactly:
        # chunk ci+1's `old` frames come from chunk ci's fresh output
        frame_idx = jnp.arange(chunk_size)[None, :, None, None, None]
        new_latents = latents
        for ci in range(n_chunks):
            denoised = denoised_all[ci][None]
            start = ci * stride
            if overlap_size > 0:
                k = jax.random.fold_in(jax.random.fold_in(offset_key, si), ci)
                offset = jnp.where(
                    ci == 0, 0, jax.random.randint(k, (), 0, overlap_size)
                )
                old = jax.lax.dynamic_slice_in_dim(
                    new_latents, start, chunk_size, axis=1
                )
                denoised = jnp.where(frame_idx < offset, old, denoised)
            new_latents = jax.lax.dynamic_update_slice_in_dim(
                new_latents, denoised, start, axis=1
            )
        return new_latents

    # ---------- video latents ----------

    def _vae_chunk_frames(self, h: int, w: int, kind: str = "decode") -> int:
        """Frames per VAE call, sized from XLA's MEASURED temp allocation,
        not the naive live-tensor count: AOT memory analysis of the
        compiled 720p programs shows decode needs ~12x and encode ~7x the
        full-resolution 128-channel activation (h*w*128*itemsize) per
        frame in scratch (bf16: 2.66 / 1.55 GiB per 720p frame).  Budget
        7.5 GiB of scratch — the largest allocatable block next to the
        resident UNet/CLIP/VAE params on a 16 GB chip (the reference
        instead chunks by 16 at fp16 on GPU, pipeline_i2vgen_xl.py:586-596,
        and decodes with decode_chunk_size=1, :384-395)."""
        act = h * w * 128 * jnp.dtype(self._vae_dtype).itemsize
        temp_per_frame = act * (12 if kind == "decode" else 7)
        budget = int(7.5 * (1 << 30))
        return max(1, min(16, budget // temp_per_frame))

    def _encode_video(self, video: jax.Array, key: jax.Array) -> jax.Array:
        """(F, H, W, 3) -> sampled, scaled latents (1, F, h, w, 4)."""
        step = self._vae_chunk_frames(video.shape[1], video.shape[2], "encode")
        zs = []
        for start in range(0, video.shape[0], step):
            chunk = jnp.asarray(video[start : start + step], self._vae_dtype)
            if chunk.shape[0] != step:  # ragged tail: pad to the compiled shape
                pad = step - chunk.shape[0]
                out = self._encode_chunk(
                    self._vae_params,
                    jnp.concatenate([chunk, chunk[-1:].repeat(pad, axis=0)], 0),
                    jax.random.fold_in(key, start))[: chunk.shape[0]]
            else:
                out = self._encode_chunk(self._vae_params, chunk,
                                         jax.random.fold_in(key, start))
            zs.append(out)
        return jnp.concatenate(zs, axis=0)[None]

    def _decode_latents(self, latents: jax.Array, decode_chunk: int = 0) -> jax.Array:
        from streamingt2v_tpu.utils.resilience import (
            decode_chunk_ladder,
            with_oom_fallback,
        )

        z = latents[0]
        base = decode_chunk or self._vae_chunk_frames(
            z.shape[1] * 8, z.shape[2] * 8)

        def decode_with(chunk: int) -> jax.Array:
            outs = []
            for start in range(0, z.shape[0], chunk):
                zc = z[start : start + chunk].astype(self._vae_dtype)
                if zc.shape[0] != chunk:  # ragged tail: pad to compiled shape
                    pad = chunk - zc.shape[0]
                    out = self._decode_chunk(
                        self._vae_params,
                        jnp.concatenate([zc, zc[-1:].repeat(pad, axis=0)], 0),
                    )[: zc.shape[0]]
                else:
                    out = self._decode_chunk(self._vae_params, zc)
                # sync PER CHUNK: only host reads synchronize on this
                # platform, and an async OOM from chunk i would otherwise
                # surface at chunk i+1's eager slice — or worse, inside the
                # NEXT ladder rung, burning it on a stale error.  One ~30 ms
                # RTT per chunk is noise next to the decode itself.
                np.asarray(jax.device_get(out[-1, -1, -1, -1]))
                outs.append(out)
            return jnp.clip(jnp.concatenate(outs, axis=0), -1.0, 1.0)

        return with_oom_fallback(
            *(lambda c=c: decode_with(c) for c in decode_chunk_ladder(base)))

    # ---------- public API ----------

    def enhance(
        self,
        video: jax.Array,                  # (F, H, W, 3) in [-1,1] at (height,width)
        key_images: Sequence[jax.Array],   # one per chunk (or one total)
        prompt_embeds: Optional[jax.Array] = None,
        seed: Optional[int] = None,
        use_randomized_blending: Optional[bool] = None,
        chunk_size: Optional[int] = None,
        overlap_size: Optional[int] = None,
    ) -> jax.Array:
        cfg = self.cfg
        self.ensure_on_device()
        seed = cfg.seed if seed is None else seed
        blending = cfg.use_randomized_blending if use_randomized_blending is None else use_randomized_blending
        chunk_size = chunk_size if chunk_size is not None else cfg.chunk_size
        overlap_size = overlap_size if overlap_size is not None else (
            cfg.overlap_size if blending else 0
        )
        stream = RngStream(seed, "enhance")
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompts()

        f = video.shape[0]
        if not blending:
            chunk_size = f
            overlap_size = 0
        stride = chunk_size - overlap_size
        n_chunks = 1 if not blending else (f - chunk_size) // stride + 1
        assert (n_chunks - 1) * stride + chunk_size == f, (
            f"video of {f} frames not divisible into chunks of {chunk_size} "
            f"with overlap {overlap_size}"
        )
        assert len(key_images) == n_chunks, (len(key_images), n_chunks)

        # per-chunk key-frame conditionings (T = chunk_size per chunk)
        conds = []
        for i, img in enumerate(key_images):
            clip_emb, il = self._encode_key_image_with_frames(
                img, stream.key(10_000 + i), chunk_size
            )
            conds.append((clip_emb, il))

        scheduler = self.m.scheduler
        timesteps = scheduler.sdedit_timesteps(cfg.num_steps, cfg.strength)
        z0 = self._encode_video(video, stream.key(1))
        noise = jax.random.normal(stream.key(2), z0.shape, z0.dtype)
        latents = scheduler.add_noise(z0, noise, int(timesteps[0]))

        ts = jnp.asarray(timesteps, jnp.int32)
        ce = jnp.stack([c for c, _ in conds])
        il = jnp.stack([il for _, il in conds])
        okey = stream.key(3)
        common = dict(num_inference_steps=cfg.num_steps, chunk_size=chunk_size,
                      stride=max(stride, 1), overlap_size=overlap_size,
                      n_chunks=n_chunks)
        if cfg.one_program:
            latents = self._denoise_video(
                self.m.unet_params, latents, ts, prompt_embeds, ce, il,
                okey, float(cfg.fps), **common)
        else:
            # Default: one compiled program PER STEP, Python loop over the
            # 30 steps with device-resident scalars (no host syncs).  The
            # whole-video scan is a single multi-minute XLA execution at
            # 720p, which trips execution watchdogs on tunneled platforms;
            # per-step dispatch costs only ~n_steps x RTT.
            step_fn = self._denoise_step
            if self.mesh is not None and self.mesh.size > 1:
                # multi-chip: batch the (chunk x CFG) forwards over 'data'
                step_fn = self._denoise_step_dp
            for si in range(ts.shape[0]):
                latents = step_fn(
                    self.m.unet_params, latents, jnp.int32(si), ts[si],
                    prompt_embeds, ce, il, okey, float(cfg.fps), **common)
        return self._decode_latents(latents)

    def _key_image_cond_impl(self, cv_params, vae_params, image, key, *,
                             num_frames):
        """Whole key-frame conditioning as ONE program (CLIP crop/resize/
        tower + VAE encode + frame-position masks): eager per-op dispatch
        costs ~30 ms RTT each on the tunneled platform."""
        cfg = self.cfg
        clip_size = self.m.clip_vision.cfg.image_size
        sq = center_crop_wide(image, (cfg.width, cfg.width))
        sq = jax.image.resize(sq, (clip_size, clip_size, 3), method="bilinear")
        pooled, _ = self.m.clip_vision.apply(
            cv_params, clip_preprocess(sq[None], clip_size)
        )
        clip_emb = jnp.concatenate([jnp.zeros_like(pooled), pooled], axis=0)
        img = center_crop_wide(image, (cfg.width, cfg.height))[None]
        z = self.m.vae.apply(
            vae_params, img.astype(self._vae_dtype), key,
            method=AutoencoderKL.encode,
        ).astype(jnp.float32)
        ramp = jnp.arange(1, num_frames, dtype=jnp.float32) / (num_frames - 1)
        masks = jnp.ones((1, num_frames - 1) + z.shape[1:], z.dtype) * (
            ramp[None, :, None, None, None])
        il = jnp.concatenate([z[:, None], masks], axis=1)
        return clip_emb, jnp.concatenate([il, il], axis=0)

    def _encode_key_image_with_frames(self, image, key, num_frames):
        return self._key_image_cond(
            self.m.clip_vision_params, self._vae_params,
            jnp.asarray(image, jnp.float32), key, num_frames=num_frames)

    def enhance_with_keyframe_prepass(self, video: jax.Array, image: jax.Array,
                                      seed: Optional[int] = None) -> jax.Array:
        """Full randomized-blending flow incl. the key-frame pre-pass
        (i2v_enhance_interface.py:90-118)."""
        cfg = self.cfg
        seed = cfg.seed if seed is None else seed
        f = video.shape[0]
        stride = cfg.chunk_size - cfg.overlap_size
        starts = [s for s in range(0, f, stride) if s + cfg.chunk_size <= f]
        if len(starts) <= 1:
            return self.enhance(video, [image], seed=seed, use_randomized_blending=False)
        key_frames = jnp.stack([video[s] for s in starts])  # (n_chunks, H, W, 3)
        # pre-pass: enhance the key frames as one short video, conditioned
        # on the input image, no blending
        enhanced_keys = self.enhance(
            key_frames, [image], seed=seed,
            use_randomized_blending=False,
        )
        max_idx = stride * (len(starts) - 1) + cfg.chunk_size
        return self.enhance(
            video[:max_idx], [enhanced_keys[i] for i in range(len(starts))],
            seed=seed, use_randomized_blending=True,
        )
