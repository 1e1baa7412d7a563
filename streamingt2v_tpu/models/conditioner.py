"""GeneralConditioner — the SVD conditioning stack.

Rebuild of reference GeneralConditioner + the five configured embedders
(models/svd/sgm/modules/encoders/modules.py:71-188; config.yaml:157-218):

  cond_frames_without_noise -> CLIP ViT-H pooled embedding  -> crossattn
  fps_id / motion_bucket_id / cond_aug -> sinusoidal embeds -> vector
  cond_frames (noise-augmented anchor) -> KL-VAE mode encode -> concat

Functional layout: outputs use (B, ...) without a frame axis; the pipeline
broadcasts to T via `broadcast_cond` (the reference repeats per-frame rows,
streaming_svd.py:197-201).  The (c, uc) pair zeroes crossattn + concat in
uc (force_uc_zero_embeddings, streaming_svd.py:184-195).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.config import ConditionerConfig, VAEConfig
from streamingt2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower, clip_preprocess
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.ops import timestep_embedding


def concat_timestep_embed(x: jax.Array, outdim: int) -> jax.Array:
    """ConcatTimestepEmbedderND (modules.py:917-933): embed each scalar dim
    independently, concatenate.  x: (B,) or (B, D) -> (B, D*outdim)."""
    if x.ndim == 1:
        x = x[:, None]
    b, d = x.shape
    emb = timestep_embedding(x.reshape(-1), outdim)
    return emb.reshape(b, d * outdim)


class Conditioner(nn.Module):
    """Holds the CLIP tower + conditioning KL-VAE encoder.

    batch keys (all (B, ...)):
      cond_frames_without_noise: (B, H, W, 3) anchor frame in [-1,1]
      cond_frames:               (B, H, W, 3) noise-augmented anchor
      fps_id, motion_bucket_id, cond_aug: (B,) scalars
    """

    cfg: ConditionerConfig
    vae_cfg: VAEConfig
    clip_cfg: CLIPVisionConfig = CLIPVisionConfig()

    def setup(self):
        if self.cfg.use_clip:
            self.clip = CLIPVisionTower(self.clip_cfg, name="clip")
        else:
            self.toy_clip = nn.Dense(self.cfg.clip_embed_dim, name="toy_clip")
        # AutoencoderKLModeOnly: legacy KL layout with quant convs, spatial
        # decoder (config.yaml:193-213); only encode is used.
        import dataclasses

        vcfg = dataclasses.replace(self.vae_cfg, temporal_decoder=False, scale_factor=1.0)
        self.cond_encoder = AutoencoderKL(vcfg, use_quant_conv=True, name="cond_encoder")

    def __call__(
        self, batch: Dict[str, jax.Array], force_zero: Tuple[str, ...] = ()
    ) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}

        # crossattn: CLIP pooled embedding as a single token (B, 1, 1024)
        if self.cfg.use_clip:
            pooled, _ = self.clip(clip_preprocess(
                batch["cond_frames_without_noise"], self.clip_cfg.image_size
            ))
        else:  # tiny-test path: project mean pixel statistics
            img = batch["cond_frames_without_noise"]
            pooled = self.toy_clip(jnp.mean(img, axis=(1, 2)))
        if "cond_frames_without_noise" in force_zero:
            pooled = jnp.zeros_like(pooled)
        out["crossattn"] = pooled[:, None, :]

        # vector: fps_id ‖ motion_bucket_id ‖ cond_aug sinusoidal embeds
        vec = jnp.concatenate(
            [
                concat_timestep_embed(batch["fps_id"], self.cfg.vector_outdim),
                concat_timestep_embed(batch["motion_bucket_id"], self.cfg.vector_outdim),
                concat_timestep_embed(batch["cond_aug"], self.cfg.vector_outdim),
            ],
            axis=-1,
        )
        out["vector"] = vec

        # concat: KL-VAE mode-encode of the noise-augmented anchor (B, h, w, 4)
        z = self.cond_encoder.encode(batch["cond_frames"])
        if "cond_frames" in force_zero:
            z = jnp.zeros_like(z)
        out["concat"] = z
        return out

    def pair(
        self, batch: Dict[str, jax.Array],
        force_uc_zero: Tuple[str, ...] = ("cond_frames", "cond_frames_without_noise"),
    ):
        """(c, uc) pair (get_unconditional_conditioning, modules.py:170-188)."""
        c = self(batch)
        uc = self(batch, force_zero=force_uc_zero)
        return c, uc

    def encode_frames(self, frames: jax.Array) -> jax.Array:
        """Pooled CLIP embedding per frame: (B, N, H, W, 3) -> (B, N, D).

        The APM token source (reference image_encoder_apm,
        streaming_svd.py:64-71): each anchor frame of the so-far-generated
        video contributes one token to the 16+1 APM context."""
        b, n = frames.shape[:2]
        flat = frames.reshape((b * n,) + frames.shape[2:])
        if self.cfg.use_clip:
            pooled, _ = self.clip(clip_preprocess(flat, self.clip_cfg.image_size))
        else:
            pooled = self.toy_clip(jnp.mean(flat, axis=(1, 2)))
        return pooled.reshape(b, n, -1)


def broadcast_cond(cond: Dict[str, jax.Array], num_frames: int) -> Dict[str, jax.Array]:
    """Expand per-batch conditionings to the (B, T, ...) layout the UNet
    consumes.  crossattn (B,1,D)->(B,T,1,D); vector (B,D)->(B,T,D);
    concat (B,h,w,4)->(B,T,h,w,4)."""
    out = dict(cond)
    out["crossattn"] = jnp.repeat(cond["crossattn"][:, None], num_frames, axis=1)
    out["vector"] = jnp.repeat(cond["vector"][:, None], num_frames, axis=1)
    out["concat"] = jnp.repeat(cond["concat"][:, None], num_frames, axis=1)
    return out
