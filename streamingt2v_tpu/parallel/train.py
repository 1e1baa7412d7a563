"""Sharded training step.

The reference ships training machinery it never runs (sgm
DiffusionEngine.training_step, reference models/svd/sgm/models/diffusion.py:
165-187, single-GPU Lightning).  Here the training step is a pure pjit'd
function over the device mesh: DP over the batch axis, TP over FF/attention
projection weights via the logical sharding rules — XLA inserts the
psum/all-gather collectives over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from streamingt2v_tpu.diffusion.loss import DiffusionLossConfig, diffusion_loss
from streamingt2v_tpu.parallel.sharding import active_mesh, shard_params, with_sharding


def make_train_step(
    network_builder: Callable[[Any], Callable],
    loss_cfg: DiffusionLossConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Build `step(params, opt_state, batch, key) -> (params, opt_state, loss)`.

    `network_builder(params)` returns the denoiser-facing network fn (e.g.
    an `openai_wrapper` / `streaming_wrapper` closure over modules).
    `batch` = {'latents': (B, T, H, W, C), 'cond': {...}}.
    """

    def loss_fn(params, batch, key):
        with active_mesh(mesh):
            latents = with_sharding(batch["latents"], mesh, ("batch",))
            net = network_builder(params)
            return diffusion_loss(loss_cfg, net, latents, batch["cond"], key)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def init_sharded_state(params, optimizer: optax.GradientTransformation, mesh: Optional[Mesh]):
    """Place params on the mesh per the logical rules and init the optimizer
    state with matching placement."""
    params = shard_params(params, mesh)
    opt_state = optimizer.init(params)
    return params, opt_state
