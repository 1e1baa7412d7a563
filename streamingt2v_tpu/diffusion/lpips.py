"""LPIPS perceptual loss (VGG16 backbone).

Rebuild of the reference's vendored LPIPS
(models/svd/sgm/modules/autoencoding/lpips/loss/lpips.py): VGG16 features
at the five relu stages, channel-unit-normalized, squared-diff, 1x1
linear heads, spatial mean, summed.  Weights load from a torchvision
VGG16 state dict + the LPIPS `vgg.pth` lin heads via `lpips_map`
(training-only in the reference; no weights ship in this repo).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamingt2v_tpu.utils.checkpoint import MapDict, t_conv2d, t_id

# VGG16 conv layers per stage (torchvision features indices)
_VGG_STAGES: Tuple[Tuple[int, ...], ...] = (
    (0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)
)
_VGG_WIDTHS = (64, 128, 256, 512, 512)

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        """x: (N, H, W, 3) in [-1,1] (LPIPS scaling applied inside)."""
        x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
        feats = []
        for si, (idxs, width) in enumerate(zip(_VGG_STAGES, _VGG_WIDTHS)):
            for li in idxs:
                x = nn.Conv(width, (3, 3), name=f"conv_{li}")(x)
                x = jax.nn.relu(x)
            feats.append(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        vgg = VGG16Features(name="vgg")
        fx = vgg(x)
        fy = vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a * jax.lax.rsqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def lpips_map(vgg_prefix: str = "net", lin_prefix: str = "") -> MapDict:
    """Map torchvision-VGG16 + LPIPS lin-head state-dict names.  The LPIPS
    release stores vgg weights as `net.slice{s}.{i}.weight` and heads as
    `lin{i}.model.1.weight`."""
    m: MapDict = {}
    slice_start = (0, 4, 9, 16, 23)  # torchvision index of each slice start
    for si, idxs in enumerate(_VGG_STAGES):
        for li in idxs:
            tk = f"{vgg_prefix}.slice{si+1}.{li}"
            m[f"vgg/conv_{li}/kernel"] = (f"{tk}.weight", t_conv2d)
            m[f"vgg/conv_{li}/bias"] = (f"{tk}.bias", t_id)
    p = f"{lin_prefix}." if lin_prefix else ""
    for i in range(5):
        m[f"lin_{i}/kernel"] = (f"{p}lin{i}.model.1.weight", t_conv2d)
    return m
