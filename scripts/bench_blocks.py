"""Per-block microbenchmarks at the production stage-1 geometry.

Times each UNet building block (res / spatial-video transformer / CAM
merger / conditioning embedder / head) standalone on the real chip, so
the whole-step profile (scripts/profile_step.py) can be attributed to
modules instead of HLO fusion names.  Methodology matches bench.py:
chain K calls inside one jit, read one scalar, subtract RTT.

Usage: python scripts/bench_blocks.py [filter-substring]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T = 2, 25
LEVELS = [  # (h, w, c) per UNet level at 576x1024 input
    (72, 128, 320),
    (36, 64, 640),
    (18, 32, 1280),
    (9, 16, 1280),
]


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


RTT = None


def timeit(name, fn, *args, k=4):
    """fn(*args) -> array; chain k calls via scan on the first arg."""
    global RTT
    if RTT is None:
        RTT = measure_rtt()
        print(f"# rtt {RTT * 1000:.1f}ms", flush=True)

    @jax.jit
    def chained(x0, rest):
        def body(x, _):
            out = fn(x, *rest)
            if out.shape == x0.shape:
                return out, None
            # shape-changing module: perturb the carry with a scalar of the
            # output so every iteration still depends on the previous one
            return x * 0.5 + out.reshape(-1)[0].astype(x.dtype), None

        out, _ = jax.lax.scan(body, x0, jnp.arange(k))
        return out.reshape(-1)[0]

    x0, rest = args[0], args[1:]
    t0 = time.time()
    float(chained(x0, rest))
    compile_s = time.time() - t0
    ts = []
    for i in range(3):
        t0 = time.time()
        float(chained(x0 + 0.001 * i, rest))
        ts.append(time.time() - t0)
    per = (sorted(ts)[len(ts) // 2] - RTT) / k * 1000
    print(f"{per:9.2f} ms  {name}   (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    from streamingt2v_tpu.models.cam import CAMConditionalModel
    from streamingt2v_tpu.models.controlnet import ControlNetConditioningEmbedding
    from streamingt2v_tpu.models.unet_blocks import (
        SpatialVideoTransformer,
        UNetVideoResBlock,
    )

    rng = np.random.RandomState(0)
    ioi = jnp.zeros((B, T), bool)
    emb = jnp.asarray(rng.randn(B, T, 1280), jnp.bfloat16)

    results = {}

    for li, (h, w, c) in enumerate(LEVELS):
        x = jnp.asarray(rng.randn(B, T, h, w, c), jnp.bfloat16)

        if not filt or "res" in filt:
            m = UNetVideoResBlock(c)
            p = jax.jit(m.init)(jax.random.PRNGKey(0), x[:, :2], emb[:, :2], ioi[:, :2])
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            results[f"res_L{li}"] = timeit(
                f"UNetVideoResBlock L{li} ({h}x{w}x{c})",
                lambda xx, pp, ee: m.apply(pp, xx, ee, ioi), x, p, emb)

        if li < 3 and (not filt or "attn" in filt):
            heads = c // 64
            m = SpatialVideoTransformer(heads=heads, dim_head=64, depth=1,
                                        context_dim=1024)
            ctx = jnp.asarray(rng.randn(B, T, 1, 1024), jnp.bfloat16)
            p = jax.jit(m.init)(jax.random.PRNGKey(0), x[:, :2], ctx[:, :2], ioi[:, :2])
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            results[f"svt_L{li}"] = timeit(
                f"SpatialVideoTransformer L{li} ({h}x{w}x{c}, {heads}h)",
                lambda xx, pp, cc: m.apply(pp, xx, cc, ioi), x, p, ctx)

        if not filt or "cam" in filt:
            m = CAMConditionalModel(attention_head_dim=64)
            kv = jnp.asarray(rng.randn(B, 7, h, w, c), jnp.bfloat16)
            p = jax.jit(m.init)(jax.random.PRNGKey(0), x[:, :2], kv[:, :2])
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            results[f"cam_L{li}"] = timeit(
                f"CAMConditionalModel L{li} ({h}x{w}x{c})",
                lambda xx, pp, kk: m.apply(pp, xx, kk), x, p, kv)

    if not filt or "cond" in filt:
        m = ControlNetConditioningEmbedding(embed_channels=320)
        pix = jnp.asarray(rng.randn(2 * 7, 576, 1024, 3), jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), pix[:1])
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        results["cond_embed"] = timeit(
            "ControlNetConditioningEmbedding (14x576x1024)",
            lambda xx, pp: m.apply(pp, xx), pix, p)

    # Stage-1 guided-step composition (CFG batch B=2):
    #   UNet:  res blocks L0..L3 input 2/2/2/2 + out 3/3/3/3 + mid 2
    #          SVT L0 5, L1 5, L2 5, mid(L3 geom) 1
    #          CAM mergers: one per input skip + mid (13 total, mixed levels)
    #   ControlNet (on 7 frames, ~0.28x the UNet's row count):
    #          encoder res 8 + mid 2, SVT 6 + mid 1, cond embedder once
    n_res = {0: 5, 1: 5, 2: 5, 3: 7}  # input+output+mid per level (approx)
    n_svt = {0: 5, 1: 5, 2: 6}
    est = 0.0
    for li in range(4):
        est += n_res[li] * results.get(f"res_L{li}", 0)
    for li in range(3):
        est += n_svt[li] * results.get(f"svt_L{li}", 0)
    print(f"\n# rough UNet-only estimate from blocks: {est:.0f} ms "
          f"(vs ~2050 ms measured plain UNet fwd)")
    print(results)


if __name__ == "__main__":
    main()
