"""HBM copy/relayout budget for the single-chip hot programs, from an
AOT compile against a real TPU topology (no chips needed).

The round-2 layout war (docs/PERF.md) showed the dominant non-attention
cost is XLA relayout copies around custom calls and reduce fusions.
This script AOT-compiles the production stage-1 guided denoise step or
the stage-2 I2VGenXL forward against a v5e topology and walks the
optimized HLO for `copy` instructions (standalone and as fusion roots),
attributing bytes by shape and operand->result layout, so layout work
can iterate WITHOUT a chip and be wall-clock-validated once at the end.

Usage:
  python scripts/copy_budget.py --stage 1 [--out FILE]
  python scripts/copy_budget.py --stage 2 [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("STREAMINGT2V_ASSUME_TPU", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

_DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}

# e.g.  %copy.1 = bf16[50,9216,320]{1,2,0:T(8,128)(2,1)} copy(%fusion.2)
_COPY_RE = re.compile(
    r"=\s+((?:bf16|f16|f32|f64|s32|u32|s8|u8|pred|s64|u64)"
    r"\[[0-9,]*\])(\{[^}]*\})?\s+copy\(([^)]*)\)"
)
# transposes that survive to the optimized HLO are HBM passes too
_TRANSPOSE_RE = re.compile(
    r"=\s+((?:bf16|f16|f32|f64|s32|u32|s8|u8|pred|s64|u64)"
    r"\[[0-9,]*\])(\{[^}]*\})?\s+transpose\("
)


def shape_bytes(s: str) -> int:
    dtype, dims = s.split("[")
    dims = dims.rstrip("]")
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def layout_of(anno: str | None) -> str:
    if not anno:
        return ""
    m = re.match(r"\{([0-9,]*)", anno)
    return m.group(1) if m else ""


def analyze_copies(txt: str) -> dict:
    per_shape: dict[tuple, dict] = {}
    total = 0
    count = 0
    for m in _COPY_RE.finditer(txt):
        shape, anno, _ = m.groups()
        b = shape_bytes(shape)
        total += b
        count += 1
        key = (shape, layout_of(anno))
        rec = per_shape.setdefault(key, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
    t_total = 0
    t_count = 0
    t_shapes: dict[tuple, dict] = {}
    for m in _TRANSPOSE_RE.finditer(txt):
        shape, anno = m.groups()
        b = shape_bytes(shape)
        t_total += b
        t_count += 1
        key = (shape, layout_of(anno))
        rec = t_shapes.setdefault(key, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
    top = sorted(per_shape.items(), key=lambda kv: -kv[1]["bytes"])[:16]
    t_top = sorted(t_shapes.items(), key=lambda kv: -kv[1]["bytes"])[:8]
    return {
        "copy_count": count,
        "copy_bytes": total,
        "copy_gb": round(total / 2**30, 2),
        "top_copies": [
            {"shape": s, "result_layout": lay, **rec} for (s, lay), rec in top
        ],
        "transpose_count": t_count,
        "transpose_bytes": t_total,
        "transpose_gb": round(t_total / 2**30, 2),
        "top_transposes": [
            {"shape": s, "result_layout": lay, **rec} for (s, lay), rec in t_top
        ],
    }


def topo_mesh():
    from jax.experimental import topologies

    from streamingt2v_tpu.config import MeshConfig
    from streamingt2v_tpu.parallel.mesh import create_mesh

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    # single-chip program: 1-device mesh on the first topo device
    return create_mesh(MeshConfig(data=1, seq=1, model=1),
                       devices=[topo.devices[0]])


def stage1_lowered():
    from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
    from streamingt2v_tpu.diffusion import denoise
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper

    ucfg, ccfg = VideoUNetConfig(), ControlNetConfig()
    unet, cn = VideoUNet(ucfg), ControlNet(ucfg, ccfg)
    B, T, FC, H, W = 2, 25, 7, 72, 128
    x = jax.ShapeDtypeStruct((1, T, H, W, 4), jnp.float32)
    cc = jax.ShapeDtypeStruct((B, T, H, W, 4), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct((B, T, 1, ucfg.context_dim), jnp.bfloat16)
    y = jax.ShapeDtypeStruct((B, T, ucfg.adm_in_channels), jnp.bfloat16)
    pix = jax.ShapeDtypeStruct((B, FC, H * 8, W * 8, 3), jnp.bfloat16)
    t0 = jax.ShapeDtypeStruct((1,), jnp.float32)
    xc = jax.ShapeDtypeStruct((1, T, H, W, 8), jnp.float32)
    u_tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), xc, t0,
        jax.ShapeDtypeStruct((1, T, 1, ucfg.context_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, T, ucfg.adm_in_channels), jnp.float32))
    xcf = jax.ShapeDtypeStruct((1, FC, H, W, 8), jnp.float32)
    c_tmpl = jax.eval_shape(
        cn.init, jax.random.PRNGKey(1), xcf, t0,
        jax.ShapeDtypeStruct((1, FC, 1, ucfg.context_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, FC, ucfg.adm_in_channels), jnp.float32),
        jax.ShapeDtypeStruct((1, FC, H * 8, W * 8, 3), jnp.float32))

    def bf16(t):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(
                a.shape, jnp.bfloat16 if a.dtype == jnp.float32 else a.dtype), t)

    u_tmpl, c_tmpl = bf16(u_tmpl), bf16(c_tmpl)

    def step(uparams, cparams, x, cond):
        net = streaming_wrapper(unet, uparams, cn, cparams, FC,
                                ctrl_cfg_shared=True)
        sigma = jnp.full((B,), 2.0)
        den = denoise(net, jnp.concatenate([x, x], 0).astype(jnp.bfloat16),
                      sigma, cond)
        return den[:1] * 0.05 + x * 0.95

    cond = {"concat": cc, "crossattn": ctx, "vector": y, "ctrl_frames": pix}
    mesh = topo_mesh()
    # bind the topology devices via a (replicated) sharding: the mesh
    # context alone does not set the lowering platform, and without it
    # the Pallas calls lower for the host CPU and fail
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    with mesh:
        return jax.jit(step, in_shardings=repl).lower(u_tmpl, c_tmpl, x, cond)


def stage2_lowered():
    from streamingt2v_tpu.models.enhance.unet import (
        I2VGenXLUNet, I2VGenXLUNetConfig,
    )

    ucfg = I2VGenXLUNetConfig()
    unet = I2VGenXLUNet(ucfg)
    B, T, H, W = 1, 38, 90, 160
    sample = jax.ShapeDtypeStruct((B, T, H, W, 4), jnp.bfloat16)
    il = jax.ShapeDtypeStruct((B, T, H, W, 4), jnp.bfloat16)
    emb = jax.ShapeDtypeStruct((B, 1024), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct((B, 77, 1024), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((B,), jnp.int32)
    fps = jax.ShapeDtypeStruct((B,), jnp.float32)
    tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 2, 8, 8, 4), jnp.float32), t, fps,
        jax.ShapeDtypeStruct((1, 2, 8, 8, 4), jnp.float32),
        jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        jax.ShapeDtypeStruct((1, 77, 1024), jnp.float32))
    tmpl = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16 if a.dtype == jnp.float32 else a.dtype), tmpl)

    def fwd(params, sample, t, fps, il, emb, ctx):
        return unet.apply(params, sample, t, fps, il, emb, ctx)

    mesh = topo_mesh()
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    with mesh:
        return jax.jit(fwd, in_shardings=repl).lower(
            tmpl, sample, t, fps, il, emb, ctx)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1, choices=[1, 2])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    print("lowering...", file=sys.stderr, flush=True)
    lowered = stage1_lowered() if args.stage == 1 else stage2_lowered()
    print("compiling...", file=sys.stderr, flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text()
    report = {"stage": args.stage, **analyze_copies(txt)}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
