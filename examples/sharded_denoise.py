"""A streaming denoise step sharded over a device mesh (DP x SP x TP).

The TPU-native scaling story in ~60 lines: build the flagship pair
(CAM-fused VideoUNet + ControlNet) at reduced width, place params and
activations with the logical sharding rules, and jit the guided denoise
over a `jax.sharding.Mesh` — XLA inserts every collective.

Without 8 real chips, run it on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_denoise.py

(If the session default backend is a single TPU, the script forces the
CPU platform so the 8 virtual devices exist.)
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# default to the CPU platform: the 8 virtual devices need it, and the
# TPU plugin here ignores the JAX_PLATFORMS env var (config knob wins).
# Set JAX_PLATFORMS to run on a real multi-chip platform instead.
jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamingt2v_tpu.config import ControlNetConfig, MeshConfig, VideoUNetConfig
from streamingt2v_tpu.diffusion import denoise
from streamingt2v_tpu.models.controlnet import ControlNet
from streamingt2v_tpu.models.video_unet import VideoUNet
from streamingt2v_tpu.models.wrappers import streaming_wrapper
from streamingt2v_tpu.parallel.mesh import create_mesh
from streamingt2v_tpu.parallel.sharding import logical_sharding, shard_params


def main() -> None:
    ucfg = VideoUNetConfig.tiny(controlnet_mode=True)
    ccfg = ControlNetConfig.tiny()
    unet, cn = VideoUNet(ucfg), ControlNet(ucfg, ccfg)

    B, T, FC, H, W = 2, 4, 2, 16, 16
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, 4) * 0.1, jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.randn(B, T, H, W, 4) * 0.1, jnp.float32),
        "crossattn": jnp.asarray(rng.randn(B, T, 1, ucfg.context_dim) * 0.1, jnp.float32),
        "vector": jnp.asarray(rng.randn(B, T, ucfg.adm_in_channels) * 0.1, jnp.float32),
        "ctrl_frames": jnp.asarray(
            rng.randn(B, FC, H * scale, W * scale, 3) * 0.1, jnp.float32),
    }
    sigma = jnp.full((B,), 2.0)
    xc = jnp.concatenate([x, cond["concat"]], axis=-1)

    up = jax.jit(unet.init)(jax.random.PRNGKey(0), xc, sigma,
                            cond["crossattn"], cond["vector"])
    cp = jax.jit(cn.init)(jax.random.PRNGKey(1), xc[:, :FC], sigma,
                          cond["crossattn"][:, :FC], cond["vector"][:, :FC],
                          cond["ctrl_frames"])

    # data=2 over the CFG/video batch, seq=2 over spatial tokens,
    # model=2 over attention heads / FF inner dims
    mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))

    def step(up, cp, x, sigma, cond):
        net = streaming_wrapper(unet, up, cn, cp, FC, mesh=mesh)
        return denoise(net, x, sigma, cond)

    with mesh:
        up_s, cp_s = shard_params(up, mesh), shard_params(cp, mesh)
        bsh = logical_sharding(mesh, ("batch",))
        x_s = jax.device_put(x, bsh)
        cond_s = {k: jax.device_put(v, bsh) for k, v in cond.items()}
        out = jax.jit(step)(up_s, cp_s, x_s, jax.device_put(sigma, bsh), cond_s)
        out.block_until_ready()

    print(f"mesh {dict(mesh.shape)}: denoised {out.shape} {out.dtype}, "
          f"finite={bool(jnp.isfinite(out).all())}")


if __name__ == "__main__":
    main()
