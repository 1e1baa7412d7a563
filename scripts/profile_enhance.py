"""Profile one full-width I2VGenXL UNet forward (stage-2 CFG-half) at the
production enhance geometry: (1, 38, 90, 160, 4) latents at 720p.

A blended DDIM step = 2 chunks x 2 CFG halves = 4 of these forwards
(reference i2v_enhance/pipeline_i2vgen_xl.py:837-909 runs the same
computation with CFG batched; we run it sequentially for HBM).

Usage: python scripts/profile_enhance.py [trace_dir]
Prints per-forward median time, FLOPs from XLA cost analysis, sustained
TF/s, and (if trace_dir given) captures a jax.profiler trace.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build():
    from streamingt2v_tpu.models.enhance.unet import I2VGenXLUNet, I2VGenXLUNetConfig

    ucfg = I2VGenXLUNetConfig()
    unet = I2VGenXLUNet(ucfg)
    B, T, H, W = 1, 38, 90, 160
    rng = np.random.RandomState(0)
    sample = jnp.asarray(rng.randn(B, T, H, W, 4), jnp.bfloat16)
    il = jnp.asarray(rng.randn(B, T, H, W, 4), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(B, 1024), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(B, 77, 1024), jnp.bfloat16)
    ts = jnp.zeros((B,), jnp.int32)
    fps = jnp.zeros((B,))

    t0 = time.time()
    params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), sample[:, :2, :8, :8], ts, fps,
        il[:, :2, :8, :8], emb, ctx)
    params = jax.jit(
        lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
        ),
        donate_argnums=0,
    )(params)
    log(f"init {time.time() - t0:.0f}s")
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    log(f"params {n_params/1e9:.2f}B")

    @jax.jit
    def fwd(params, sample, il, emb, ctx):
        out = unet.apply(params, sample, ts, fps, il, emb, ctx)
        return out[0, 0, 0, 0, 0]

    return fwd, (params, sample, il, emb, ctx)


def measure_rtt():
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


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else ""
    log(f"devices: {jax.devices()}")
    fwd, args = build()

    lowered = fwd.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    log(f"cost analysis: {flops/1e12:.1f} TFLOP/forward")

    rtt = measure_rtt()
    log(f"rtt {rtt*1000:.1f}ms")
    t0 = time.time()
    float(compiled(*args))
    log(f"first run {time.time() - t0:.0f}s")

    ts = []
    for i in range(5):
        t0 = time.time()
        float(compiled(*args))
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2] - rtt
    log(f"forward {dt*1000:.0f}ms -> {flops/dt/1e12:.1f} TF/s sustained "
        f"({flops/dt/1e12/197*100:.0f}% of v5e bf16 peak)")
    log(f"blended DDIM step (4 forwards) ~ {4*dt:.1f}s")

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            float(compiled(*args))
        log(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
