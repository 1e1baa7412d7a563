"""Scan-compiled diffusion samplers.

k-diffusion-style samplers (reference sampling.py:21-362) rebuilt as
`lax.scan` bodies so the whole 30-step loop compiles into one XLA program —
the reference's Python-level step loop (sampling.py:114-128) is the seam
this compiles away.  Sigma schedules are static numpy constants; the
per-step guided denoise is the only network call.

A sampler takes `denoise_fn(x, sigma, cond) -> denoised` where `cond` is
already the guider-merged dict, plus the raw (c, uc) pair, and returns the
final latents.  All samplers share the EDM pre-scaling
x *= sqrt(1 + sigma_0^2) (reference sampling.py:47).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import SamplerConfig
from streamingt2v_tpu.diffusion.discretization import get_sigmas
from streamingt2v_tpu.diffusion.guiders import Guider, make_guider

DenoiseFn = Callable[[jax.Array, jax.Array, Dict[str, Any]], jax.Array]


def _to_d(x, sigma, denoised):
    return (x - denoised) / jnp.maximum(sigma, 1e-12)


def _guided(denoise_fn: DenoiseFn, guider: Guider, x, sigma_scalar, cond, uc):
    """One guided denoise: CFG-double, denoise, recombine.  sigma is a
    scalar; the denoiser receives a per-batch vector."""
    b = x.shape[0]
    sigma_vec = jnp.full((b,), sigma_scalar, dtype=jnp.float32)
    x_in, s_in, c_in = guider.prepare(x, sigma_vec, cond, uc)
    den = denoise_fn(x_in, s_in, c_in)
    return guider.combine(den)


def _ancestral_sigmas(sigma_from, sigma_to, eta):
    if eta == 0.0:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / jnp.maximum(sigma_from**2, 1e-20)),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def _euler_edm_scan(cfg: SamplerConfig, guider: Guider, denoise_fn, x, cond, uc, key,
                    sigmas: np.ndarray, heun: bool):
    n = len(sigmas) - 1
    churn_gamma = min(cfg.s_churn / max(n, 1), 2**0.5 - 1) if cfg.s_churn > 0 else 0.0
    sig = jnp.asarray(sigmas, jnp.float32)

    def body(x, i):
        sigma, next_sigma = sig[i], sig[i + 1]
        if churn_gamma > 0.0:
            in_range = jnp.logical_and(sigma >= cfg.s_tmin, sigma <= cfg.s_tmax)
            gamma = jnp.where(in_range, churn_gamma, 0.0)
            sigma_hat = sigma * (gamma + 1.0)
            eps = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            x = x + eps * cfg.s_noise * jnp.sqrt(
                jnp.maximum(sigma_hat**2 - sigma**2, 0.0)
            ).astype(x.dtype)
        else:
            sigma_hat = sigma
        denoised = _guided(denoise_fn, guider, x, sigma_hat, cond, uc)
        d = _to_d(x, sigma_hat, denoised)
        dt = next_sigma - sigma_hat
        euler = x + dt * d
        if not heun:
            return euler, None

        def correction(_):
            den2 = _guided(denoise_fn, guider, euler, next_sigma, cond, uc)
            d2 = _to_d(euler, next_sigma, den2)
            return x + dt * 0.5 * (d + d2)

        x_next = jax.lax.cond(next_sigma > 1e-14, correction, lambda _: euler, None)
        return x_next, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def _euler_ancestral_scan(cfg: SamplerConfig, guider: Guider, denoise_fn, x, cond, uc,
                          key, sigmas: np.ndarray, eta: float = 1.0):
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)

    def body(x, i):
        sigma, next_sigma = sig[i], sig[i + 1]
        sigma_down, sigma_up = _ancestral_sigmas(sigma, next_sigma, eta)
        denoised = _guided(denoise_fn, guider, x, sigma, cond, uc)
        d = _to_d(x, sigma, denoised)
        x = x + (sigma_down - sigma) * d
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
        x = jnp.where(next_sigma > 0.0, x + noise * cfg.s_noise * sigma_up, x)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def _dpmpp2s_ancestral_scan(cfg: SamplerConfig, guider: Guider, denoise_fn, x, cond, uc,
                            key, sigmas: np.ndarray, eta: float = 1.0):
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)

    def body(x, i):
        sigma, next_sigma = sig[i], sig[i + 1]
        sigma_down, sigma_up = _ancestral_sigmas(sigma, next_sigma, eta)
        denoised = _guided(denoise_fn, guider, x, sigma, cond, uc)
        d = _to_d(x, sigma, denoised)
        x_euler = x + (sigma_down - sigma) * d

        def dpmpp(_):
            t = -jnp.log(jnp.maximum(sigma, 1e-12))
            t_next = -jnp.log(jnp.maximum(sigma_down, 1e-12))
            h = t_next - t
            s = t + 0.5 * h
            x2 = jnp.exp(-s + t) * x - jnp.expm1(-0.5 * h) * denoised
            den2 = _guided(denoise_fn, guider, x2, jnp.exp(-s), cond, uc)
            return jnp.exp(-t_next + t) * x - jnp.expm1(-h) * den2

        x_new = jax.lax.cond(sigma_down > 1e-14, dpmpp, lambda _: x_euler, None)
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
        x_new = jnp.where(next_sigma > 0.0, x_new + noise * cfg.s_noise * sigma_up, x_new)
        return x_new, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def _dpmpp2m_scan(cfg: SamplerConfig, guider: Guider, denoise_fn, x, cond, uc, key,
                  sigmas: np.ndarray):
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)

    def body(carry, i):
        x, old_denoised = carry
        prev_sigma, sigma, next_sigma = sig[jnp.maximum(i - 1, 0)], sig[i], sig[i + 1]
        denoised = _guided(denoise_fn, guider, x, sigma, cond, uc)
        t = -jnp.log(jnp.maximum(sigma, 1e-12))
        t_next = -jnp.log(jnp.maximum(next_sigma, 1e-12))
        h = t_next - t
        mult1 = jnp.exp(-h)
        mult2 = jnp.expm1(-h)
        x_standard = mult1 * x - mult2 * denoised
        h_last = t - (-jnp.log(jnp.maximum(prev_sigma, 1e-12)))
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d
        use_advanced = jnp.logical_and(i > 0, next_sigma > 1e-14)
        x_new = jnp.where(use_advanced, x_advanced, x_standard)
        return (x_new, denoised), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(n))
    return x


def _lms_coeff_matrix(sigmas: np.ndarray, order: int) -> np.ndarray:
    """Adams-Bashforth-style coefficients over the sigma grid, integrated
    exactly (the integrand is a degree<(order) polynomial — Gauss-Legendre
    with ceil(order/2)+1 points is exact, no scipy needed)."""
    n = len(sigmas) - 1
    coeffs = np.zeros((n, order), dtype=np.float64)
    nodes, weights = np.polynomial.legendre.leggauss(max(2, order))
    for i in range(n):
        cur_order = min(i + 1, order)
        a, b = sigmas[i], sigmas[i + 1]
        taus = 0.5 * (b - a) * nodes + 0.5 * (b + a)
        for j in range(cur_order):
            prod = np.ones_like(taus)
            for k in range(cur_order):
                if j == k:
                    continue
                prod *= (taus - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
            coeffs[i, j] = 0.5 * (b - a) * np.sum(weights * prod)
    return coeffs.astype(np.float32)


def _lms_scan(cfg: SamplerConfig, guider: Guider, denoise_fn, x, cond, uc, key,
              sigmas: np.ndarray, order: int = 4):
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    coeffs = jnp.asarray(_lms_coeff_matrix(sigmas, order))

    def body(carry, i):
        x, ds = carry  # ds: (order, *x.shape), newest at index 0
        sigma = sig[i]
        denoised = _guided(denoise_fn, guider, x, sigma, cond, uc)
        d = _to_d(x, sigma, denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        c = coeffs[i].reshape((order,) + (1,) * x.ndim)
        x = x + jnp.sum(c * ds, axis=0)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(body, (x, ds0), jnp.arange(n))
    return x


_SAMPLER_FNS = {
    "euler_edm": functools.partial(_euler_edm_scan, heun=False),
    "heun_edm": functools.partial(_euler_edm_scan, heun=True),
    "euler_ancestral": _euler_ancestral_scan,
    "dpmpp2s": _dpmpp2s_ancestral_scan,
    "dpmpp2m": _dpmpp2m_scan,
    "lms": _lms_scan,
}


def make_sampler(cfg: SamplerConfig):
    """Build `sample(denoise_fn, x, cond, uc, key) -> latents`."""
    sigmas = get_sigmas(
        cfg.discretization, cfg.num_steps,
        sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max, rho=cfg.rho,
    )
    guider = make_guider(cfg.guider)
    step_fn = _SAMPLER_FNS[cfg.kind]

    def sample_fn(denoise_fn: DenoiseFn, x: jax.Array, cond, uc,
                  key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(0)
        x = x * np.sqrt(1.0 + float(sigmas[0]) ** 2)  # sampling.py:47
        return step_fn(cfg, guider, denoise_fn, x, cond, uc, key, sigmas)

    return sample_fn


def sample(cfg: SamplerConfig, denoise_fn: DenoiseFn, x, cond, uc, key=None):
    return make_sampler(cfg)(denoise_fn, x, cond, uc, key)
