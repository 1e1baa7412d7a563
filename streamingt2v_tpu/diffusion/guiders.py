"""Classifier-free-guidance guiders.

Functional rebuild of reference guiders.py:24-131.  A guider is a pair:

  prepare(x, sigma, c, uc) -> (x_in, sigma_in, cond_in)   # CFG doubling
  combine(denoised, ...)   -> guided denoised             # uncond/cond mix

Convention: the doubled batch is (uncond ‖ cond) along axis 0, matching the
reference (guiders.py:37).  Latents are (B, T, H, W, C); the per-frame CFG
scale of LinearPredictionGuider broadcasts over axis 1 — no (b t) reshaping
needed in this layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import GuiderConfig

CondDict = Dict[str, Any]
_CFG_KEYS = ("vector", "crossattn", "concat", "ctrl_frames")


def _double(x, sigma, c: CondDict, uc: CondDict):
    c_out = {}
    for k in c:
        if k in _CFG_KEYS:
            c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
        else:
            c_out[k] = c[k]
    return jnp.concatenate([x, x], axis=0), jnp.concatenate([sigma, sigma], axis=0), c_out


@dataclasses.dataclass(frozen=True)
class Guider:
    prepare: Callable[..., Tuple[jax.Array, jax.Array, CondDict]]
    combine: Callable[[jax.Array], jax.Array]
    batch_multiplier: int  # 2 for CFG guiders, 1 for identity


def make_guider(cfg: GuiderConfig) -> Guider:
    if cfg.kind == "identity":
        return Guider(
            prepare=lambda x, s, c, uc: (x, s, dict(c)),
            combine=lambda d: d,
            batch_multiplier=1,
        )

    if cfg.kind == "vanilla":
        scale = cfg.max_scale

        def combine_vanilla(denoised):
            x_u, x_c = jnp.split(denoised, 2, axis=0)
            return x_u + scale * (x_c - x_u)

        return Guider(prepare=_double, combine=combine_vanilla, batch_multiplier=2)

    if cfg.kind in ("linear_prediction", "triangle_prediction"):
        if cfg.kind == "linear_prediction":
            scales = np.linspace(cfg.min_scale, cfg.max_scale, cfg.num_frames)
        else:
            # triangle wave with period 1 over [0,1] (reference guiders.py:102-131)
            values = np.linspace(0.0, 1.0, cfg.num_frames)
            tri = 2.0 * np.abs(values - np.floor(values + 0.5))
            scales = tri * (cfg.max_scale - cfg.min_scale) + cfg.min_scale
        scales = jnp.asarray(scales, dtype=jnp.float32)

        def combine_per_frame(denoised):
            x_u, x_c = jnp.split(denoised, 2, axis=0)
            s = scales.reshape((1, -1) + (1,) * (x_u.ndim - 2)).astype(x_u.dtype)
            return x_u + s * (x_c - x_u)

        return Guider(prepare=_double, combine=combine_per_frame, batch_multiplier=2)

    raise ValueError(cfg.kind)
