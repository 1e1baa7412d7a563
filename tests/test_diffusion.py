"""Diffusion-math goldens: scalings (closed form), sigma schedules,
guiders, denoiser preconditioning, and sampler convergence properties.

Sampler property test: for a point-mass data distribution the ideal
denoiser is D(x, sigma) = x0; every sampler must then recover x0 exactly
(the ODE is linear and all integrators are exact on it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import GuiderConfig, SamplerConfig
from streamingt2v_tpu.diffusion import (
    align_your_steps_sigmas,
    denoise,
    edm_sigmas,
    legacy_ddpm_sigmas,
    make_guider,
    make_sampler,
    v_scaling_with_edm_cnoise,
)
from streamingt2v_tpu.diffusion.scaling import edm_scaling, eps_scaling, v_scaling


def test_v_scaling_with_edm_cnoise_closed_form():
    sigma = jnp.asarray([0.5, 2.0, 700.0])
    c_skip, c_out, c_in, c_noise = v_scaling_with_edm_cnoise(sigma)
    s = np.asarray(sigma)
    np.testing.assert_allclose(np.asarray(c_skip), 1 / (s**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), -s / np.sqrt(s**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_in), 1 / np.sqrt(s**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_noise), 0.25 * np.log(s), rtol=1e-6)


def test_other_scalings_closed_form():
    s = jnp.asarray([1.5])
    c_skip, c_out, c_in, c_noise = edm_scaling(s, sigma_data=0.5)
    np.testing.assert_allclose(float(c_skip[0]), 0.25 / (1.5**2 + 0.25), rtol=1e-6)
    c_skip, c_out, c_in, c_noise = eps_scaling(s)
    assert float(c_skip[0]) == 1.0 and float(c_out[0]) == -1.5
    c_skip, _, _, c_noise = v_scaling(s)
    np.testing.assert_allclose(float(c_noise[0]), 1.5, rtol=1e-6)


def test_ays_schedule_endpoints_and_shape():
    sig = align_your_steps_sigmas(30)
    assert sig.shape == (31,)
    np.testing.assert_allclose(sig[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(sig[29], 0.002, rtol=1e-4)
    assert sig[30] == 0.0
    assert np.all(np.diff(sig) < 0)
    # n == number of knots reproduces the knots exactly
    sig11 = align_your_steps_sigmas(11, append_zero=False)
    np.testing.assert_allclose(
        sig11, [700.0, 54.5, 15.886, 7.977, 4.248, 1.789, 0.981, 0.403, 0.173, 0.034, 0.002],
        rtol=1e-5,
    )


def test_edm_schedule():
    sig = edm_sigmas(10, sigma_min=0.002, sigma_max=80.0, rho=7.0)
    np.testing.assert_allclose(sig[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(sig[9], 0.002, rtol=1e-5)
    assert sig[10] == 0.0


def test_legacy_ddpm_schedule_monotonic():
    sig = legacy_ddpm_sigmas(25)
    assert sig.shape == (26,) and np.all(np.diff(sig[:-1]) < 0) and sig[-1] == 0.0


def test_linear_prediction_guider():
    g = make_guider(GuiderConfig(kind="linear_prediction", min_scale=1.0, max_scale=3.0, num_frames=5))
    x = jnp.ones((1, 5, 2, 2, 1))
    sigma = jnp.ones((1,))
    c = {"vector": jnp.ones((1, 4)), "other": 7}
    uc = {"vector": jnp.zeros((1, 4)), "other": 7}
    x_in, s_in, c_in = g.prepare(x, sigma, c, uc)
    assert x_in.shape == (2, 5, 2, 2, 1) and s_in.shape == (2,)
    np.testing.assert_allclose(np.asarray(c_in["vector"]), [[0, 0, 0, 0], [1, 1, 1, 1]])
    # uncond=0, cond=1 -> output equals per-frame scale
    den = jnp.concatenate([jnp.zeros((1, 5, 2, 2, 1)), jnp.ones((1, 5, 2, 2, 1))], axis=0)
    out = g.combine(den)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0, 0]), np.linspace(1, 3, 5), rtol=1e-6)


def test_identity_guider_no_doubling():
    g = make_guider(GuiderConfig(kind="identity"))
    x = jnp.ones((2, 3))
    x_in, _, _ = g.prepare(x, jnp.ones((2,)), {}, {})
    assert x_in.shape == (2, 3) and g.batch_multiplier == 1


def test_denoiser_preconditioning():
    # network == 0 -> D(x) = x * c_skip
    x = jnp.full((2, 3, 4, 4, 1), 2.0)
    sigma = jnp.asarray([1.0, 3.0])
    out = denoise(lambda xi, cn, c: jnp.zeros_like(xi), x, sigma, {})
    expected = 2.0 / (np.asarray(sigma) ** 2 + 1.0)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0, 0, 0]), expected, rtol=1e-6)
    # network sees x * c_in and c_noise = 0.25 log sigma
    seen = {}
    def spy(xi, cn, c):
        seen["x"] = xi; seen["cn"] = cn
        return jnp.zeros_like(xi)
    denoise(spy, x, sigma, {})
    np.testing.assert_allclose(np.asarray(seen["cn"]), 0.25 * np.log(np.asarray(sigma)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(seen["x"][:, 0, 0, 0, 0]), 2.0 / np.sqrt(np.asarray(sigma) ** 2 + 1), rtol=1e-6
    )


@pytest.mark.parametrize("kind", ["euler_edm", "heun_edm", "euler_ancestral", "dpmpp2s", "dpmpp2m", "lms"])
def test_samplers_recover_point_mass(kind):
    x0 = jnp.asarray(np.random.RandomState(7).randn(1, 4, 2, 2, 3).astype(np.float32))
    cfg = SamplerConfig(kind=kind, num_steps=20, discretization="edm", sigma_max=80.0,
                        guider=GuiderConfig(kind="identity"))
    sampler = make_sampler(cfg)

    def ideal_denoiser(x, sigma, cond):
        return jnp.broadcast_to(x0, x.shape)

    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    out = sampler(ideal_denoiser, noise, {}, {}, key=jax.random.PRNGKey(1))
    # all integrators are exact for the linear point-mass ODE; ancestral
    # noise injection vanishes as sigma -> 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-2)


def test_euler_edm_with_cfg_guider_runs():
    cfg = SamplerConfig(num_steps=5, guider=GuiderConfig(num_frames=4))
    sampler = make_sampler(cfg)
    calls = {"n": 0, "batch": None}

    def denoise_fn(x, sigma, cond):
        calls["n"] += 1
        calls["batch"] = x.shape[0]
        return x * 0.5

    x = jnp.ones((1, 4, 2, 2, 1))
    out = sampler(denoise_fn, x, {"vector": jnp.ones((1, 2))}, {"vector": jnp.zeros((1, 2))})
    assert out.shape == x.shape
    assert calls["batch"] == 2  # CFG doubling reached the network
