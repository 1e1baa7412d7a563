"""Benchmark: single-chunk StreamingSVD denoise step on one TPU chip.

Measures the stage-1 hot loop (BASELINE.md config #2): one guided EDM
denoise step = CFG-doubled (2x25)-frame VideoUNet forward + ControlNet on
the 7 conditional frames + CAM fusion, at the production geometry
(72x128 latents = 576x1024 pixels, 320-ch UNet, bf16).

Prints ONE JSON line:
  {"metric": "stage1_denoise_frames_per_sec_per_chip", "value": ...,
   "unit": "frames/s", "vs_baseline": ...}

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
the baseline constant below is an estimated A100 figure for the same step
(25-frame SVD-XT+ControlNet forward x 30 EDM steps ~= 60 s/chunk on A100
fp16 => ~0.42 frames/s), derived from typical public SVD-XT timings.

Timing methodology: on this environment's tunneled TPU platform,
jax.block_until_ready does NOT synchronize; only host reads do, and each
carries a ~30 ms RPC round-trip.  We therefore chain K steps inside one
jit, read one scalar, subtract the measured round-trip, and divide by K.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Estimated A100 reference throughput for the same computation (frames/s).
BASELINE_FRAMES_PER_SEC = 0.42
STEPS_PER_CHUNK = 30  # config.yaml:150


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_rtt() -> float:
    small = jnp.ones((8, 128), jnp.float32)
    g = jax.jit(lambda a: a[0, 0] + 1)
    for _ in range(3):
        float(g(small))
    ts = []
    for i in range(10):
        t0 = time.time()
        float(g(small + i))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> None:
    from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
    from streamingt2v_tpu.diffusion import denoise
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper

    log(f"devices: {jax.devices()}")
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

    t0 = time.time()
    uparams = jax.jit(unet.init)(jax.random.PRNGKey(0), xc[:, :2], t_cont, ctx[:1, :2], y[:1, :2])
    cparams = jax.jit(cn.init)(
        jax.random.PRNGKey(1), xc[:, :2], t_cont, ctx[:1, :2, :1], y[:1, :2], pix[:1, :2]
    )
    to_bf16 = lambda p: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p
    )
    uparams, cparams = to_bf16(uparams), to_bf16(cparams)
    log(f"init {time.time() - t0:.0f}s")

    cond = {"concat": cc, "crossattn": ctx, "vector": y, "ctrl_frames": pix}
    K = 3  # chained steps per timed call

    @jax.jit
    def k_steps(uparams, cparams, x0, cond):
        net = streaming_wrapper(unet, uparams, cn, cparams, FC)

        def body(xc, i):
            sigma = jnp.full((B,), 2.0) / (1.0 + 0.1 * i)
            den = denoise(net, jnp.concatenate([xc, xc], 0), sigma, cond)
            return den[:1] * 0.05 + xc * 0.95, None

        out, _ = jax.lax.scan(body, x0, jnp.arange(K))
        return out[0, 0, 0, 0, 0]

    rtt = measure_rtt()
    log(f"rtt {rtt * 1000:.1f}ms")

    t0 = time.time()
    float(k_steps(uparams, cparams, x, cond))
    log(f"compile+first run {time.time() - t0:.0f}s")

    ts = []
    for i in range(5):
        xi = x + 0.001 * i
        t0 = time.time()
        float(k_steps(uparams, cparams, xi, cond))
        ts.append(time.time() - t0)
    per_step = (sorted(ts)[len(ts) // 2] - rtt) / K
    chunk_time = per_step * STEPS_PER_CHUNK
    frames_per_sec = T / chunk_time
    log(f"per-step {per_step * 1000:.0f}ms, chunk({STEPS_PER_CHUNK} steps) {chunk_time:.1f}s")

    print(json.dumps({
        "metric": "stage1_denoise_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
