"""Production-WIDTH sharded-vs-single equivalence on the virtual mesh
(VERDICT r3 #2b).

The tiny-config equivalence tests (tests/test_parallel.py) prove the
sharding rules + collectives are semantically right; this script proves
they stay right at the REAL channel widths and spatial geometry the
product runs: full VideoUNetConfig (320ch, 1024ctx, CAM mergers) +
ControlNet at 72x128 latents, CFG-doubled batch, reduced T so one CPU
core can execute the FLOPs.

Compares the streaming denoise step on the recommended DP2xSP4 mesh
(docs/PARALLEL.md) against the unsharded forward, f32, 8 virtual CPU
devices.

Usage: python scripts/prod_equivalence.py [--mesh 2,4,1] [--T 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="2,4,1")
    ap.add_argument("--T", type=int, default=4)
    args = ap.parse_args()
    d, s, m = (int(x) for x in args.mesh.split(","))

    from streamingt2v_tpu.config import ControlNetConfig, MeshConfig, VideoUNetConfig
    from streamingt2v_tpu.diffusion import denoise
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper
    from streamingt2v_tpu.parallel.mesh import create_mesh
    from streamingt2v_tpu.parallel.sharding import logical_sharding, shard_params

    ucfg = VideoUNetConfig()  # PRODUCTION width
    ccfg = ControlNetConfig()
    unet, cn = VideoUNet(ucfg), ControlNet(ucfg, ccfg)

    B, T, FC, H, W = 2, args.T, 2, 72, 128
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

    t0 = time.time()
    up = jax.jit(unet.init)(jax.random.PRNGKey(0), xc[:1, :2], sigma[:1],
                            cond["crossattn"][:1, :2], cond["vector"][:1, :2])
    cp = jax.jit(cn.init)(jax.random.PRNGKey(1), xc[:1, :FC], sigma[:1],
                          cond["crossattn"][:1, :FC, :1], cond["vector"][:1, :FC],
                          cond["ctrl_frames"][:1])
    n = sum(int(np.prod(a.shape)) for a in jax.tree.leaves((up, cp)))
    print(f"init {time.time() - t0:.0f}s, {n / 1e9:.2f}B params", flush=True)

    def step(up, cp, x, sigma, cond):
        net = streaming_wrapper(unet, up, cn, cp, FC, ctrl_cfg_shared=True)
        return denoise(net, x, sigma, cond)

    t0 = time.time()
    ref = np.asarray(jax.jit(step)(up, cp, x, sigma, cond))
    print(f"single-device forward {time.time() - t0:.0f}s", flush=True)

    mesh = create_mesh(MeshConfig(data=d, seq=s, model=m))
    with mesh:
        up_s, cp_s = shard_params(up, mesh), shard_params(cp, mesh)
        bsh = logical_sharding(mesh, ("batch",))
        x_s = jax.device_put(x, bsh)
        cond_s = {k: jax.device_put(v, bsh) for k, v in cond.items()}
        t0 = time.time()
        out = np.asarray(jax.jit(step)(
            up_s, cp_s, x_s, jax.device_put(sigma, bsh), cond_s))
        print(f"sharded forward (mesh {d},{s},{m}) {time.time() - t0:.0f}s",
              flush=True)

    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"max |sharded - single| / max|single| = {err:.2e}")
    assert np.allclose(out, ref, atol=5e-4, rtol=5e-4), err
    print(f"EQUIVALENT at production width (mesh {d},{s},{m}, T={T})")


if __name__ == "__main__":
    main()
