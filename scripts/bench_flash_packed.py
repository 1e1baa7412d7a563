"""Head-packed vs fold/unfold flash attention on the real chip.

The packed kernel (ops/flash_attention.py:flash_attention_packed)
consumes the (B, L, H*D) layout the QKV projections emit, so the
(B, L, H*D) <-> (B*H, L, D) fold/unfold transposes — 4 HBM round trips
of q/k/v/o per call — never materialize.  This script measures the END
TO END `attention()` entry (transposes included) at the hot spatial
self-attention geometries of both stages, packed vs split, to decide
the default routing.

Usage: python scripts/bench_flash_packed.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


# (label, B, L, heads, head_dim) — B = folded (batch*frames) rows, the
# layout the UNet spatial blocks call attention() with
GEOMS = [
    ("s1-L0 (2x25f, 72x128, 5h x 64)", 50, 9216, 5, 64),
    ("s1-L1 (2x25f, 36x64, 10h x 64)", 50, 2304, 10, 64),
    ("s2-L0 (2x38f, 90x160, 5h x 64)", 76, 14400, 5, 64),
    ("s2-L1 (2x38f, 45x80, 10h x 64)", 76, 3600, 10, 64),
]


def main():
    from streamingt2v_tpu.ops import attention as attn_mod

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f}ms", file=sys.stderr)
    rng = np.random.RandomState(0)
    for label, b, l, h, d in GEOMS:
        q = jnp.asarray(rng.randn(b, l, h * d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, l, h * d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, l, h * d), jnp.bfloat16)
        flops = 4 * b * h * l * l * d
        print(f"-- {label}: {flops/1e12:.2f} TFLOP --", flush=True)
        outs = {}
        for mode in ("split", "packed"):
            os.environ["STREAMINGT2V_FLASH_PACKED"] = (
                "1" if mode == "packed" else "0")

            def run(q, k, v):
                o = attn_mod.attention(q, k, v, num_heads=h, backend="flash")
                o = attn_mod.attention(o, k, v, num_heads=h, backend="flash")
                return o

            g = jax.jit(run)
            try:
                o = g(q, k, v)
                outs[mode] = np.asarray(o[:1, :4]).astype(np.float32)
                ts = []
                for i in range(4):
                    t0 = time.time()
                    float(g(q + i * 0.001, k, v)[0, 0, 0])
                    ts.append(time.time() - t0)
                dt = (sorted(ts)[len(ts) // 2] - rtt) / 2
                print(f"  {mode:>6}: {dt*1000:7.1f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"  {mode:>6}: FAILED {str(e)[:120]}", flush=True)
        if len(outs) == 2:
            err = float(np.abs(outs["packed"] - outs["split"]).max())
            print(f"  max |packed - split| on sampled rows: {err:.2e}",
                  flush=True)
    os.environ.pop("STREAMINGT2V_FLASH_PACKED", None)


if __name__ == "__main__":
    main()
