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
    skip_nonfinite: bool = False,
):
    """Build `step(params, opt_state, batch, key) -> (params, opt_state, loss)`.

    `network_builder(params)` returns the denoiser-facing network fn (e.g.
    an `openai_wrapper` / `streaming_wrapper` closure over modules).
    `batch` = {'latents': (B, T, H, W, C), 'cond': {...}}.

    `skip_nonfinite` arms the on-device failure guard
    (utils.resilience.nonfinite_guard): a step whose gradients contain
    NaN/Inf applies a zero update instead of corrupting the params, and the
    returned loss is NaN-preserved so monitoring still sees the event.
    """

    def loss_fn(params, batch, key):
        with active_mesh(mesh):
            latents = with_sharding(batch["latents"], mesh, ("batch",))
            net = network_builder(params)
            return diffusion_loss(loss_cfg, net, latents, batch["cond"], key)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        if skip_nonfinite:
            from streamingt2v_tpu.utils.resilience import nonfinite_guard

            grads, ok = nonfinite_guard(grads)
            new_updates, new_opt_state = optimizer.update(grads, opt_state, params)
            # freeze the optimizer state too on a skipped step (momentum/
            # count must not advance on a zero update)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
            )
            updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)),
                                   new_updates)
        else:
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
