"""DDIM scheduler (diffusers-semantics) for the I2VGen-XL enhancement pass.

Implements the subset the reference exercises (pipeline_i2vgen_xl.py:
scheduler.set_timesteps / add_noise / step with eta=0): discrete beta
schedules, leading/trailing/linspace timestep spacing, epsilon / v
prediction.  All knobs are configurable; `DDIMScheduler.from_config`
ingests the checkpoint's scheduler_config.json so the deployed values
always come from the shipped i2vgen-xl config, not these defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | squaredcos_cap_v2
    steps_offset: int = 1
    timestep_spacing: str = "leading"  # leading | trailing | linspace
    prediction_type: str = "epsilon"  # epsilon | v_prediction
    set_alpha_to_one: bool = False
    clip_sample: bool = False
    rescale_betas_zero_snr: bool = False


def _make_betas(cfg: DDIMConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(n, dtype=np.float64)
        betas = np.minimum(1 - alpha_bar((ts + 1) / n) / alpha_bar(ts / n), 0.999)
    else:
        raise ValueError(cfg.beta_schedule)
    return betas


def _rescale_zero_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift the sqrt-alpha-bar schedule so the last step has zero SNR
    (arXiv 2305.08891)."""
    s = np.sqrt(alphas_cumprod)
    s0, sT = s[0], s[-1]
    s = (s - sT) * s0 / (s0 - sT)
    return s**2


class DDIMScheduler:
    def __init__(self, cfg: DDIMConfig = DDIMConfig()):
        self.cfg = cfg
        betas = _make_betas(cfg)
        acp = np.cumprod(1.0 - betas)
        if cfg.rescale_betas_zero_snr:
            acp = _rescale_zero_snr(acp)
        self.alphas_cumprod = acp.astype(np.float32)
        self.final_alpha_cumprod = 1.0 if cfg.set_alpha_to_one else float(acp[0])

    @classmethod
    def from_config(cls, config: dict) -> "DDIMScheduler":
        known = {f.name for f in dataclasses.fields(DDIMConfig)}
        return cls(DDIMConfig(**{k: v for k, v in config.items() if k in known}))

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        cfg = self.cfg
        n, N = num_inference_steps, cfg.num_train_timesteps
        if cfg.timestep_spacing == "leading":
            step = N // n
            ts = (np.arange(n) * step).round()[::-1].astype(np.int64) + cfg.steps_offset
        elif cfg.timestep_spacing == "trailing":
            ts = np.round(np.arange(N, 0, -N / n)).astype(np.int64) - 1
        elif cfg.timestep_spacing == "linspace":
            ts = np.linspace(0, N - 1, n).round()[::-1].astype(np.int64)
        else:
            raise ValueError(cfg.timestep_spacing)
        return ts

    def sdedit_timesteps(self, num_inference_steps: int, strength: float) -> np.ndarray:
        """Strength-truncated schedule (pipeline get_timesteps,
        pipeline_i2vgen_xl.py:541-551)."""
        init = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init, 0)
        return self.timesteps(num_inference_steps)[t_start:]

    def add_noise(self, x0: jax.Array, noise: jax.Array, t) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod)[jnp.asarray(t)]
        sqrt_a = jnp.sqrt(acp).astype(x0.dtype)
        sqrt_1ma = jnp.sqrt(1.0 - acp).astype(x0.dtype)
        return sqrt_a * x0 + sqrt_1ma * noise

    def step(self, model_output: jax.Array, t, sample: jax.Array,
             num_inference_steps: int) -> jax.Array:
        """One deterministic (eta=0) DDIM step x_t -> x_{t-dt}."""
        cfg = self.cfg
        dt = cfg.num_train_timesteps // num_inference_steps
        t = jnp.asarray(t)
        prev_t = t - dt
        acp = jnp.asarray(self.alphas_cumprod)
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)],
                           self.final_alpha_cumprod)
        sqrt_at = jnp.sqrt(a_t)
        sqrt_1mat = jnp.sqrt(1.0 - a_t)
        if cfg.prediction_type == "epsilon":
            pred_x0 = (sample - sqrt_1mat * model_output) / sqrt_at
            eps = model_output
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = sqrt_at * sample - sqrt_1mat * model_output
            eps = sqrt_at * model_output + sqrt_1mat * sample
        else:
            raise ValueError(cfg.prediction_type)
        if cfg.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            eps = (sample - sqrt_at * pred_x0) / sqrt_1mat
        return jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * eps
