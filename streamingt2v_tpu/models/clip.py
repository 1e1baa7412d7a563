"""OpenCLIP ViT-H/14 visual tower (laion2b_s32b_b79k weights layout).

TPU rebuild of the image encoder behind FrozenOpenCLIPImageEmbedder
(reference models/svd/sgm/modules/encoders/modules.py:574-732): patch14
conv (no bias), class token, 257-token positional embedding, pre-LN
transformer (32 layers, width 1280, 16 heads, MLP 5120, GELU), ln_post,
1280->1024 projection.  Returns (pooled, tokens): pooled is the projected
CLS embedding used as the UNet's cross-attention context; tokens are the
post-ln_post patch tokens (consumed by the APM variant).

Preprocessing: [-1,1] input -> bicubic 224x224 resize (antialiased) ->
CLIP mean/std normalization (modules.py:624-635).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.ops import layer_norm

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    mlp_ratio: float = 4.0
    output_dim: int = 1024

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=28, patch_size=14, width=32, layers=2, heads=2, output_dim=16)


def clip_preprocess(x: jax.Array, image_size: int = 224) -> jax.Array:
    """(N, H, W, 3) in [-1,1] -> normalized (N, S, S, 3)."""
    n = x.shape[0]
    x = jax.image.resize(x, (n, image_size, image_size, 3), method="bicubic", antialias=True)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


class CLIPAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        n, s, c = x.shape
        qkv = nn.Dense(3 * c, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        from streamingt2v_tpu.ops import attention

        o = attention(q, k, v, num_heads=self.heads)
        return nn.Dense(c, name="out_proj")(o)


class CLIPBlock(nn.Module):
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s1 = self.param("ln_1_scale", nn.initializers.ones, (c,))
        b1 = self.param("ln_1_bias", nn.initializers.zeros, (c,))
        x = x + CLIPAttention(self.heads, name="attn")(layer_norm(x, s1, b1))
        s2 = self.param("ln_2_scale", nn.initializers.ones, (c,))
        b2 = self.param("ln_2_bias", nn.initializers.zeros, (c,))
        h = layer_norm(x, s2, b2)
        h = nn.Dense(self.mlp_dim, name="mlp_fc")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        return x + nn.Dense(c, name="mlp_proj")(h)


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """pixels: (N, S, S, 3) preprocessed -> (pooled (N, out), tokens)."""
        cfg = self.cfg
        grid = cfg.image_size // cfg.patch_size
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False, name="conv1",
        )(pixels)
        n = x.shape[0]
        x = x.reshape(n, grid * grid, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, cfg.width)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02), (grid * grid + 1, cfg.width)
        )
        x = x + pos.astype(x.dtype)
        s, b = (self.param("ln_pre_scale", nn.initializers.ones, (cfg.width,)),
                self.param("ln_pre_bias", nn.initializers.zeros, (cfg.width,)))
        x = layer_norm(x, s, b)
        for i in range(cfg.layers):
            x = CLIPBlock(cfg.heads, int(cfg.width * cfg.mlp_ratio), name=f"resblock_{i}")(x)
        s, b = (self.param("ln_post_scale", nn.initializers.ones, (cfg.width,)),
                self.param("ln_post_bias", nn.initializers.zeros, (cfg.width,)))
        x = layer_norm(x, s, b)
        proj = self.param("proj", nn.initializers.normal(0.02), (cfg.width, cfg.output_dim))
        pooled = x[:, 0] @ proj.astype(x.dtype)
        return pooled, x[:, 1:]


def encode_image(tower: CLIPVisionTower, params, image: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """image: (N, H, W, 3) in [-1,1] -> (pooled, tokens)."""
    return tower.apply(params, clip_preprocess(image, tower.cfg.image_size))
