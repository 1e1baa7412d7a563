"""Swapping samplers / discretizations / guiders on one denoiser.

The diffusion toolkit is functional: `make_sampler(SamplerConfig)`
compiles the whole sampling loop (lax.scan) for any combination of
  kind           euler_edm | heun_edm | euler_ancestral | dpmpp2s | dpmpp2m | lms
  discretization edm | legacy_ddpm | align_your_steps
  guider         vanilla | linear_prediction | triangle_prediction | identity
(reference: sgm sampling.py / discretizer.py / guiders.py).

Runs anywhere:  python examples/custom_schedule.py
"""

import dataclasses
import os
import sys

import jax

# this environment's TPU plugin ignores the JAX_PLATFORMS env var;
# the config knob (set before backend init) is what takes effect
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamingt2v_tpu.config import GuiderConfig, SamplerConfig, VideoUNetConfig
from streamingt2v_tpu.diffusion import denoise
from streamingt2v_tpu.diffusion.samplers import make_sampler
from streamingt2v_tpu.models.video_unet import VideoUNet


def main() -> None:
    ucfg = VideoUNetConfig.tiny(controlnet_mode=False)
    unet = VideoUNet(ucfg)

    B, T, H, W = 1, 2, 16, 16
    rng = np.random.RandomState(0)
    cond = {
        "concat": jnp.zeros((B, T, H, W, 4)),
        "crossattn": jnp.asarray(rng.randn(B, T, 1, ucfg.context_dim) * 0.1, jnp.float32),
        "vector": jnp.asarray(rng.randn(B, T, ucfg.adm_in_channels) * 0.1, jnp.float32),
    }
    uc = cond  # a real pipeline passes the unconditional embeddings here
    xc = jnp.concatenate([jnp.zeros((B, T, H, W, 4)), cond["concat"]], -1)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), xc, jnp.ones((B,)),
                                cond["crossattn"], cond["vector"])

    def net(x, c_noise, c):
        return unet.apply(params, jnp.concatenate([x, c["concat"]], -1),
                          c_noise, c["crossattn"], c["vector"])

    def denoise_fn(x, sigma, c):
        return denoise(net, x, sigma, c)

    noise = jax.random.normal(jax.random.PRNGKey(7), (B, T, H, W, 4))

    for kind, disc in [("euler_edm", "align_your_steps"),
                       ("dpmpp2m", "edm"),
                       ("lms", "legacy_ddpm")]:
        cfg = SamplerConfig(kind=kind, discretization=disc, num_steps=4,
                            guider=GuiderConfig(kind="linear_prediction",
                                                max_scale=2.5, num_frames=T))
        sampler = make_sampler(cfg)
        out = jax.jit(lambda x: sampler(denoise_fn, x, cond, uc))(noise)
        print(f"{kind:16s} + {disc:16s} -> {out.shape}, "
              f"std {float(out.std()):.3f}, finite={bool(jnp.isfinite(out).all())}")


if __name__ == "__main__":
    main()
