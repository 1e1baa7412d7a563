"""Per-step ICI communication budget for the sharded streaming denoise step.

Compiles (compile-only: ShapeDtypeStruct avatars, no weights materialized)
the FULL-WIDTH flagship program — CFG-doubled 25-frame 72x128 CAM-fused
VideoUNet + ControlNet (reference inference config, config.yaml:69-150) —
against an 8-device mesh, then walks the optimized HLO for collectives and
reports bytes moved per step, per collective type, plus the compiler's FLOP
count.  These numbers back docs/PARALLEL.md's projected v5p-8 speedup.

Backend (round 5): by default the program is AOT-compiled against a REAL
TPU v5e 2x4 topology (jax.experimental.topologies — no chips needed), so
the HLO is the actual TPU partitioner's output with production dtypes on
the wire; the round-4 "halve every f32 collective" CPU-normalization
heuristic is gone.  --backend cpu keeps the old analysis for comparison.

Usage:  python scripts/comm_budget.py [--mesh data,seq,model] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}

# matches e.g.:  %all-reduce.3 = bf16[2,25,9216,320]{...} all-reduce(
_COLLECTIVE_RE = re.compile(
    r"=\s+(?:\()?((?:bf16|f16|f32|f64|s32|u32|s8|u8|pred|s64|u64)"
    r"\[[0-9,]*\])[^=]*?\s(all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)\(",
)


def shape_bytes(s: str) -> int:
    dtype, dims = s.split("[")
    dims = dims.rstrip("]")
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def analyze(hlo_text: str, exact_dtypes: bool):
    """Count collective bytes in the optimized HLO.

    exact_dtypes=True (TPU-topology backend): wire dtypes in the HLO ARE
    the production dtypes — `production_bytes` == `bytes`, no heuristics.

    exact_dtypes=False (CPU backend): CPU float-normalization legalizes
    every bf16 dot to f32 BEFORE the simplifier runs, so converts migrate
    across collectives and gathers of bf16 model tensors appear as f32.
    For those we report production (bf16-wire) size = bytes/2.  This
    blanket halving under-counts any genuinely-f32 production collective
    (ADVICE r4) — which is why the topology backend is now the default."""
    per_type: dict[str, dict] = {}
    per_shape: dict[tuple, int] = {}

    def prod_bytes(shape: str, b: int) -> int:
        if exact_dtypes:
            return b
        return b // 2 if shape.startswith("f32") else b

    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape, op = m.group(1), m.group(2)
        b = shape_bytes(shape)
        rec = per_type.setdefault(op, {"count": 0, "bytes": 0,
                                       "production_bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
        rec["production_bytes"] += prod_bytes(shape, b)
        per_shape[(op, shape)] = per_shape.get((op, shape), 0) + 1
    top = sorted(per_shape.items(), key=lambda kv: -shape_bytes(kv[0][1]) * kv[1])
    top_shapes = [
        {"op": op, "shape": s, "count": n,
         "total_bytes": shape_bytes(s) * n,
         "production_bytes": prod_bytes(s, shape_bytes(s)) * n,
         "production_dtype": (s.split("[")[0] if exact_dtypes else
                              ("bf16" if s.startswith("f32") else s.split("[")[0]))}
        for (op, s), n in top[:12]
    ]
    return per_type, top_shapes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="2,2,2")
    ap.add_argument("--out", default="")
    ap.add_argument("--width", type=int, default=0,
                    help="override model_channels (0 = production 320)")
    ap.add_argument("--backend", default="topo", choices=["topo", "cpu"],
                    help="topo = AOT-compile against a real TPU v5e 2x4 "
                         "topology (exact wire dtypes); cpu = legacy "
                         "CPU-backend analysis")
    args = ap.parse_args()
    d, s, m = (int(x) for x in args.mesh.split(","))

    topo_devices = None
    if args.backend == "topo":
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4")
        topo_devices = list(topo.devices)
        # the attention dispatcher keys on jax.default_backend(), which is
        # "cpu" here (the host process) even though the AOT compile target
        # is TPU — tell it the target is TPU so the budget measures the
        # program a real slice would run (flash/ring routing by geometry),
        # not the CPU einsum fallback (whose KV all-gathers don't exist on
        # the ring path)
        os.environ.setdefault("STREAMINGT2V_ASSUME_TPU", "1")

    import dataclasses

    from streamingt2v_tpu.config import (
        ControlNetConfig, DTypePolicy, MeshConfig, VideoUNetConfig,
    )
    from streamingt2v_tpu.diffusion import denoise
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper
    from streamingt2v_tpu.parallel.mesh import create_mesh
    from streamingt2v_tpu.parallel.sharding import (
        logical_sharding, param_sharding_tree,
    )

    mesh = create_mesh(MeshConfig(data=d, seq=s, model=m), devices=topo_devices)
    ucfg = VideoUNetConfig()
    if args.width:
        ucfg = dataclasses.replace(
            ucfg, model_channels=args.width,
            context_dim=min(ucfg.context_dim, args.width * 4),
        )
    ccfg = ControlNetConfig()
    unet, cn = VideoUNet(ucfg), ControlNet(ucfg, ccfg)

    # production single-chunk geometry (bench.py config #2): CFG-doubled
    B, T, FC, H, W = 2, 25, 7, 72, 128
    x = jax.ShapeDtypeStruct((1, T, H, W, 4), jnp.float32)
    cc = jax.ShapeDtypeStruct((B, T, H, W, 4), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct((B, T, 1, ucfg.context_dim), jnp.bfloat16)
    y = jax.ShapeDtypeStruct((B, T, ucfg.adm_in_channels), jnp.bfloat16)
    pix = jax.ShapeDtypeStruct((B, FC, H * 8, W * 8, 3), jnp.bfloat16)
    sigma = jax.ShapeDtypeStruct((B,), jnp.float32)

    xc = jax.ShapeDtypeStruct((1, T, H, W, 8), jnp.float32)
    t0 = jax.ShapeDtypeStruct((1,), jnp.float32)
    print("eval_shape init...", flush=True)
    u_tmpl = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), xc, t0,
        jax.ShapeDtypeStruct((1, T, 1, ucfg.context_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, T, ucfg.adm_in_channels), jnp.float32))
    # ControlNet sees only the F_cond conditional frames (wrappers.py:76-83)
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

    def step(uparams, cparams, x, sigma, cond):
        net = streaming_wrapper(unet, uparams, cn, cparams, FC, mesh=mesh,
                                ctrl_cfg_shared=True)
        return denoise(net, jnp.concatenate([x, x], 0).astype(jnp.bfloat16),
                       sigma, cond)

    bsh = logical_sharding(mesh, ("batch",))
    rep = logical_sharding(mesh, (None,))
    in_shardings = (
        param_sharding_tree(u_tmpl, mesh),
        param_sharding_tree(c_tmpl, mesh),
        rep, rep,
        {"concat": bsh, "crossattn": bsh, "vector": bsh, "ctrl_frames": bsh},
    )
    cond = {"concat": cc, "crossattn": ctx, "vector": y, "ctrl_frames": pix}
    print("lowering...", flush=True)
    with mesh:
        lowered = jax.jit(step, in_shardings=in_shardings).lower(
            u_tmpl, c_tmpl, x, sigma, cond)
        print("compiling...", flush=True)
        compiled = lowered.compile()

    txt = compiled.as_text()
    per_type, top_shapes = analyze(txt, exact_dtypes=args.backend == "topo")
    total = sum(r["bytes"] for r in per_type.values())
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops = 0.0

    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(u_tmpl))
    n_params += sum(int(np.prod(a.shape)) for a in jax.tree.leaves(c_tmpl))

    total_prod = sum(r["production_bytes"] for r in per_type.values())
    report = {
        "backend": args.backend,
        "ring_attention": os.environ.get("STREAMINGT2V_RING_ATTN", "1") != "0",
        "mesh": {"data": d, "seq": s, "model": m},
        "geometry": {"B": B, "T": T, "FC": FC, "H": H, "W": W,
                     "model_channels": ucfg.model_channels},
        "params": n_params,
        "flops_per_step": flops,
        "collectives": per_type,
        "total_collective_bytes": total,
        "total_production_bytes": total_prod,
        "dtype_note": (
            "TPU-topology backend: HLO wire dtypes ARE production dtypes; "
            "production_bytes == bytes (no heuristics)."
            if args.backend == "topo" else
            "CPU backend: f32 collectives are float-normalization "
            "artifacts; production (TPU bf16) wire bytes are halved — "
            "under-counts genuinely-f32 collectives, see analyze()."),
        "top_collective_shapes": top_shapes,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
