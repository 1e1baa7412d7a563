"""Training-path tests: diffusion loss semantics + sharded train step on
the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from streamingt2v_tpu.config import MeshConfig, VideoUNetConfig
from streamingt2v_tpu.diffusion.loss import (
    DiffusionLossConfig,
    diffusion_loss,
    discrete_sigma_sampler,
    edm_sigma_sampler,
    loss_weighting,
)
from streamingt2v_tpu.models.video_unet import VideoUNet
from streamingt2v_tpu.models.wrappers import openai_wrapper
from streamingt2v_tpu.parallel.mesh import create_mesh
from streamingt2v_tpu.parallel.train import init_sharded_state, make_train_step


import pytest

pytestmark = pytest.mark.slow


def test_edm_sigma_sampler_lognormal():
    sig = edm_sigma_sampler(jax.random.PRNGKey(0), 20000)
    logs = np.log(np.asarray(sig))
    assert abs(logs.mean() + 1.2) < 0.05
    assert abs(logs.std() - 1.2) < 0.05


def test_discrete_sigma_sampler_in_schedule():
    sig = discrete_sigma_sampler(jax.random.PRNGKey(0), 100, num_idx=50)
    from streamingt2v_tpu.diffusion.discretization import get_sigmas
    sched = get_sigmas("legacy_ddpm", 50, append_zero=False)
    assert np.all(np.isin(np.round(np.asarray(sig), 5), np.round(sched, 5)))


def test_loss_weightings():
    s = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(loss_weighting("eps", s)), [4.0, 0.25])
    np.testing.assert_allclose(
        np.asarray(loss_weighting("v", s)), (np.asarray(s) ** 2 + 1) / np.asarray(s) ** 2
    )
    np.testing.assert_allclose(np.asarray(loss_weighting("unit", s)), [1.0, 1.0])


def test_perfect_denoiser_zero_loss():
    """A network that inverts the v-preconditioning exactly gives ~0 loss."""
    x0 = jnp.asarray(np.random.RandomState(0).randn(4, 2, 4, 4, 3), jnp.float32)

    def network(xin, c_noise, cond):
        sigma = jnp.exp(4.0 * c_noise).reshape(-1, 1, 1, 1, 1)
        x_orig = xin * jnp.sqrt(sigma**2 + 1.0)
        return (x0 - x_orig / (sigma**2 + 1.0)) * (-jnp.sqrt(sigma**2 + 1.0) / sigma)

    loss = diffusion_loss(DiffusionLossConfig(), network, x0, {}, jax.random.PRNGKey(0))
    assert float(loss) < 1e-8


def test_sharded_train_step_runs_and_descends():
    mesh = create_mesh(MeshConfig(data=4, seq=1, model=2))
    ucfg = VideoUNetConfig.tiny(controlnet_mode=False)
    unet = VideoUNet(ucfg)
    B, T, H, W = 8, 2, 8, 8
    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.randn(B, T, H, W, 4), jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.randn(B, T, H, W, 4), jnp.float32),
        "crossattn": jnp.asarray(rng.randn(B, T, 1, ucfg.context_dim), jnp.float32),
        "vector": jnp.asarray(rng.randn(B, T, ucfg.adm_in_channels), jnp.float32),
    }
    xc = jnp.concatenate([latents, cond["concat"]], axis=-1)
    params = unet.init(jax.random.PRNGKey(0), xc, jnp.ones((B,)), cond["crossattn"], cond["vector"])
    opt = optax.adam(1e-3)
    with mesh:
        params, opt_state = init_sharded_state(params, opt, mesh)
        step = make_train_step(lambda p: openai_wrapper(unet, p), DiffusionLossConfig(), opt, mesh)
        batch = {"latents": latents, "cond": cond}
        losses = []
        for i in range(3):
            params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(1))
            losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch+key: loss must decrease
