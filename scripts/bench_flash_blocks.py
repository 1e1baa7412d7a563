"""Flash-attention block-size sweep on the real chip.

Times the Pallas flash kernel at the hot pipeline geometries across
(block_q, block_k) choices — including the auto pick — to calibrate
the block cost model in ops/flash_attention.py.

Usage: python scripts/bench_flash_blocks.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.ops.flash_attention import flash_attention


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


# (label, B, Lq, Lk, D) — B folds batch*heads
GEOMS = [
    # mask-cost probe: Lk=14336 divides 1024 exactly (no padding mask)
    ("s2-L0-nomask", 190, 14400, 14336, 64),
    ("s2-L0 (38f 720p, 5h)", 190, 14400, 14400, 64),
    ("s2-L1 (38f 720p, 10h)", 380, 3600, 3600, 64),
    ("s1-L0 (2x25f 576p, 5h)", 250, 9216, 9216, 64),
]

# block choices to sweep; (0, 0) = auto pick
BLOCKS = [(0, 0), (1024, 1024), (960, 1024), (960, 1152), (1152, 1024),
          (720, 1024), (1024, 896), (960, 896), (1024, 768), (512, 1024)]


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f}ms", file=sys.stderr)
    rng = np.random.RandomState(0)
    for label, b, lq, lk, d in GEOMS:
        q = jnp.asarray(rng.randn(b, lq, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, lk, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, lk, d), jnp.bfloat16)
        flops = 4 * b * lq * lk * d
        print(f"-- {label}: ({b}, {lq}x{lk}, {d}), {flops/1e12:.2f} TFLOP --",
              flush=True)
        for bq, bk in BLOCKS:
            if bq > lq + 8 or bk > lk + 128:
                continue

            @jax.jit
            def g(q, k, v, bq=bq, bk=bk):
                o = flash_attention(q, k, v, block_q=bq, block_k=bk)
                o = flash_attention(o, k, v, block_q=bq, block_k=bk)
                return o[0, 0, 0]

            try:
                float(g(q, k, v))  # compile
                ts = []
                for i in range(4):
                    t0 = time.time()
                    float(g(q + i * 0.001, k, v))
                    ts.append(time.time() - t0)
                dt = (sorted(ts)[len(ts) // 2] - rtt) / 2
                print(f"  bq={bq or 'auto':>5} bk={bk or '':>5}: "
                      f"{dt*1000:7.1f} ms  {flops/dt/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"  bq={bq} bk={bk}: FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
