"""Ring vs gathered attention: comm volume + equivalence on the virtual mesh.

Compiles the seq-sharded spatial self-attention at the production stage-1
geometry (b*h = 250 rows, 9216 tokens, d=64) both ways on an 8-virtual-CPU
DP2xSP4 mesh, and reports per-collective bytes from the optimized HLO plus
a numerical equivalence check.  Backs VERDICT r3 item 7 / PARALLEL.md's
blockwise-KV lever.

Usage: python scripts/ring_comm.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.comm_budget import analyze  # noqa: E402
from streamingt2v_tpu.config import MeshConfig  # noqa: E402
from streamingt2v_tpu.parallel.mesh import create_mesh  # noqa: E402
from streamingt2v_tpu.parallel.ring_attention import ring_attention  # noqa: E402
from streamingt2v_tpu.parallel.sharding import active_mesh, shard  # noqa: E402
from streamingt2v_tpu.ops.attention import dot_product_attention  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    mesh = create_mesh(MeshConfig(data=2, seq=4, model=1))
    # scaled-down spatial-attention geometry: the comm-bytes RATIO between
    # the two programs is geometry-independent (both move (n-1)/n of KV);
    # the full 250x9216 gathered program materializes ~84 GB of f32 scores,
    # which the CPU analysis host cannot execute.
    b, l, d = 32, 2304, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, l, d) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, l, d) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, l, d) * 0.5, jnp.bfloat16)

    def gathered(q, k, v):
        # the current XLA-path behavior: q stays (batch, tokens)-sharded,
        # kv replicated over seq (GSPMD inserts the all-gather)
        with active_mesh(mesh):
            q = shard(q, "batch", "tokens", None)
            k = shard(k, "batch", None, None)
            v = shard(v, "batch", None, None)
            return dot_product_attention(q, k, v)

    def ring(q, k, v):
        return ring_attention(q, k, v, mesh)

    report = {"mesh": dict(mesh.shape), "geometry": {"bh": b, "l": l, "d": d}}
    outs = {}
    # in the real program q/k/v are PRODUCED token-sharded (projections of
    # the token-sharded activation) — pin the inputs that way, else the
    # gathered path starts from replicated arrays and needs no collective
    from jax.sharding import NamedSharding
    tok_sharded = NamedSharding(mesh, P(("data",), "seq", None))
    q, k, v = (jax.device_put(t, tok_sharded) for t in (q, k, v))
    for name, fn in [("gathered", gathered), ("ring", ring)]:
        with mesh:
            jitted = jax.jit(fn, in_shardings=(tok_sharded,) * 3)
            txt = jitted.lower(q, k, v).compile().as_text()
            outs[name] = np.asarray(jitted(q, k, v), np.float32)
        per_type, top = analyze(txt)
        report[name] = {
            "collectives": per_type,
            "total_bytes": sum(r["bytes"] for r in per_type.values()),
            "total_production_bytes": sum(
                r["production_bytes"] for r in per_type.values()),
            "top_shapes": top[:4],
        }
    diff = float(np.max(np.abs(outs["ring"] - outs["gathered"])))
    report["max_abs_diff"] = diff
    g, r = (report["gathered"]["total_production_bytes"],
            report["ring"]["total_production_bytes"])
    report["ring_over_gather_bytes"] = round(r / g, 3) if g else None
    print(json.dumps(report, indent=1))
    assert diff < 2e-2, diff
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
