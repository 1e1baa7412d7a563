"""CLI mirroring the reference's inference_i2v.py surface.

Flags match reference inference_i2v.py:30-47: --input --output
--num_frames --out_fps --chunk_size --overlap_size
--use_randomized_blending (--use_memopt is accepted for compatibility and
ignored: memory scaling on TPU comes from sharding/remat, not offload).

Checkpoint ingestion: --ckpt_dir points at a directory of converted
checkpoints (see utils/checkpoint.py); without it the pipeline runs with
random weights (smoke mode, --tiny recommended).
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("streamingt2v_tpu")
    p.add_argument("--input", required=True, help="input image file or directory")
    p.add_argument("--output", default="results", help="output directory")
    p.add_argument("--num_frames", type=int, default=200)
    p.add_argument("--out_fps", type=int, default=24)
    p.add_argument("--chunk_size", type=int, default=38)
    p.add_argument("--overlap_size", type=int, default=12)
    p.add_argument("--use_randomized_blending", action="store_true")
    p.add_argument("--use_memopt", action="store_true",
                   help="accepted for reference CLI compatibility; no-op on TPU")
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--container", choices=["mp4", "y4m"], default="mp4",
                   help="y4m streams through the native async media feeder "
                        "when built (encode overlaps compute)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--mesh", default=None, metavar="DATA,SEQ,MODEL",
                   help="device mesh for multi-chip runs (e.g. 2,4,1): "
                        "stage 1 shards params/activations per the logical "
                        "rules; stage 2 runs its (chunk x CFG) forwards "
                        "data-parallel")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight config (smoke testing)")
    p.add_argument("--random_weights", action="store_true",
                   help="build stages 2+3 at production width with random "
                        "weights when no --ckpt_dir is given (full product "
                        "geometry without the published checkpoints)")
    p.add_argument("--skip_enhance", action="store_true")
    p.add_argument("--skip_interpolation", action="store_true")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="PATH=VALUE",
                   help="nested config override, e.g. --set sampler.num_steps=25")
    return p


def main(argv=None) -> int:
    from streamingt2v_tpu.config import PipelineConfig
    from streamingt2v_tpu.pipeline.build import build_pipeline
    from streamingt2v_tpu.pipeline.full import StreamingT2VPipeline
    from streamingt2v_tpu.utils.compile_cache import enable_persistent_cache
    from streamingt2v_tpu.utils.profiling import timing_report

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    if args.tiny:
        cfg = PipelineConfig.tiny()
        cfg = dataclasses.replace(
            cfg, num_frames=min(args.num_frames, 16), out_fps=args.out_fps,
            seed=args.seed,
        )
    else:
        cfg = PipelineConfig(
            num_frames=args.num_frames, out_fps=args.out_fps, seed=args.seed,
            use_randomized_blending=args.use_randomized_blending,
            chunk_size=args.chunk_size, overlap_size=args.overlap_size,
        )
        # the blending geometry lives on the stage-2 config (the reference
        # threads the same three flags into its enhance interface,
        # inference_i2v.py:241-247)
        cfg = dataclasses.replace(cfg, enhance=dataclasses.replace(
            cfg.enhance,
            chunk_size=args.chunk_size, overlap_size=args.overlap_size,
            use_randomized_blending=args.use_randomized_blending,
        ))
    if args.overrides:
        from streamingt2v_tpu.utils.overrides import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)
    if args.use_memopt:
        print("[streamingt2v_tpu] --use_memopt is a no-op on TPU (sharding/remat instead)")

    mesh = None
    if args.mesh:
        from streamingt2v_tpu.config import MeshConfig
        from streamingt2v_tpu.parallel.mesh import create_mesh

        d, s, m = (int(v) for v in args.mesh.split(","))
        mesh = create_mesh(MeshConfig(data=d, seq=s, model=m))

    # production runs hold weights in bf16 (the reference ships fp16
    # weights under 16-mixed autocast, config.yaml:8,287); the VAE stays
    # f32 (disable_first_stage_autocast, config.yaml:310).  bf16 at BUILD
    # time: the full-width f32 trees are ~19 GB together and cannot
    # co-reside on a 16 GB chip even transiently.
    stage1 = build_pipeline(cfg, seed=args.seed, mesh=mesh, bf16=not args.tiny)
    if args.ckpt_dir:
        from streamingt2v_tpu.utils.loader import load_stage1_checkpoints

        stage1 = load_stage1_checkpoints(stage1, args.ckpt_dir)
        if not args.tiny:
            from streamingt2v_tpu.pipeline.build import cast_params_bf16

            stage1.models = dataclasses.replace(
                stage1.models,
                unet_params=cast_params_bf16(stage1.models.unet_params),
                controlnet_params=cast_params_bf16(stage1.models.controlnet_params),
                svd_unet_params=cast_params_bf16(stage1.models.svd_unet_params),
                conditioner_params=cast_params_bf16(stage1.models.conditioner_params),
            )

    enhance = None if args.skip_enhance else _maybe_build_enhance(cfg, args, mesh)
    interp = None if args.skip_interpolation else _maybe_build_interpolate(cfg, args, mesh)
    pipe = StreamingT2VPipeline(cfg, stage1, enhance, interp)

    inputs = (
        sorted(glob.glob(os.path.join(args.input, "*")))
        if os.path.isdir(args.input) else [args.input]
    )
    os.makedirs(args.output, exist_ok=True)
    for path in inputs:
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.output, f"{name}.{args.container}")
        print(f"[streamingt2v_tpu] {path} -> {out_path}")
        pipe(path, out_path, seed=args.seed)
    print(json.dumps(timing_report(), indent=2))
    return 0


def _maybe_build_enhance(cfg, args, mesh=None):
    """Stage 2 requires its own checkpoints; skip with a notice if absent
    (or build it at production width with random weights on request)."""
    if not args.tiny and not args.ckpt_dir and args.random_weights:
        from streamingt2v_tpu.pipeline.build import build_enhance_random

        print("[streamingt2v_tpu] stage 2 (enhance): random weights at "
              "production width (--random_weights)")
        return build_enhance_random(cfg, seed=args.seed, mesh=mesh)
    if args.tiny or not args.ckpt_dir:
        print("[streamingt2v_tpu] stage 2 (enhance) skipped: no checkpoints")
        return None
    from streamingt2v_tpu.utils.loader import load_enhance_pipeline

    return load_enhance_pipeline(cfg, args.ckpt_dir, mesh=mesh)


def _maybe_build_interpolate(cfg, args, mesh=None):
    if not args.tiny and not args.ckpt_dir and args.random_weights:
        from streamingt2v_tpu.pipeline.build import build_interpolate_random

        print("[streamingt2v_tpu] stage 3 (interpolation): random weights "
              "(--random_weights)")
        return build_interpolate_random(cfg, seed=args.seed, mesh=mesh)
    if args.tiny or not args.ckpt_dir:
        print("[streamingt2v_tpu] stage 3 (interpolation) skipped: no checkpoints")
        return None
    from streamingt2v_tpu.utils.loader import load_interpolate_pipeline

    return load_interpolate_pipeline(cfg, args.ckpt_dir, mesh=mesh)


if __name__ == "__main__":
    sys.exit(main())
