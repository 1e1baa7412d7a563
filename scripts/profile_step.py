"""Capture a jax.profiler trace of one guided stage-1 denoise step at the
production geometry (bench.py's computation) and print a device-time
bucket summary.

Usage: python scripts/profile_step.py [trace_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step():
    from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
    from streamingt2v_tpu.diffusion import denoise
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper

    ucfg = VideoUNetConfig()
    ccfg = ControlNetConfig()
    unet, cn = VideoUNet(ucfg), ControlNet(ucfg, ccfg)

    B, T, FC, H, W = 2, 25, 7, 72, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, T, H, W, 4), jnp.float32)
    cc = jnp.asarray(rng.randn(B, T, H, W, 4), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(B, T, 1, 1024), jnp.bfloat16)
    y = jnp.asarray(rng.randn(B, T, 768), jnp.bfloat16)
    pix = jnp.asarray(rng.randn(B, FC, H * 8, W * 8, 3), jnp.bfloat16)
    t_cont = jnp.zeros((1,))
    xc = jnp.concatenate([x.astype(jnp.bfloat16), cc[:1]], -1)

    uparams = jax.jit(unet.init)(jax.random.PRNGKey(0), xc[:, :2], t_cont, ctx[:1, :2], y[:1, :2])
    cparams = jax.jit(cn.init)(
        jax.random.PRNGKey(1), xc[:, :2], t_cont, ctx[:1, :2, :1], y[:1, :2], pix[:1, :2]
    )
    to_bf16 = lambda p: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p
    )
    uparams, cparams = to_bf16(uparams), to_bf16(cparams)
    cond = {"concat": cc, "crossattn": ctx, "vector": y, "ctrl_frames": pix}

    @jax.jit
    def step(uparams, cparams, x0, cond):
        net = streaming_wrapper(unet, uparams, cn, cparams, FC, ctrl_cfg_shared=True)
        sigma = jnp.full((B,), 2.0)
        den = denoise(net, jnp.concatenate([x0, x0], 0), sigma, cond)
        return den[:1] * 0.05 + x0 * 0.95

    return step, (uparams, cparams, x, cond)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    step, args = build_step()
    print("compiling...", file=sys.stderr)
    t0 = time.time()
    out = step(*args)
    float(out[0, 0, 0, 0, 0])
    print(f"compile+run {time.time() - t0:.0f}s", file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            out = step(*args)
        float(out[0, 0, 0, 0, 0])
    print("trace written to", trace_dir, file=sys.stderr)


if __name__ == "__main__":
    main()
