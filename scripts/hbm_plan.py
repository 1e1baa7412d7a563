"""Per-program HBM plans for the production stage-1 programs.

Compiles each jitted program of the product pipeline AOT (abstract
param trees from the registered factories — no device memory is
touched beyond the compiles) and prints XLA's planned argument /
output / temp sizes, plus the resident tree sizes.  This is the tool
that pinned the round-5 stage-1 fit: trees 8.7 GiB + the largest
program temps must stay under the 16 GiB chip, and the answer decides
program-split and tree-drop points (pipeline/streaming.py).

Usage:  python scripts/hbm_plan.py [--decode-chunk N]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

from streamingt2v_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from streamingt2v_tpu.config import PipelineConfig
from streamingt2v_tpu.models.clip import CLIPVisionConfig
from streamingt2v_tpu.pipeline.build import build_pipeline
from streamingt2v_tpu.utils.rng import generation_key

GB = 2**30


def report(name: str, lowered) -> None:
    t0 = time.time()
    ma = lowered.compile().memory_analysis()
    print(f"{name}: args {ma.argument_size_in_bytes / GB:.2f} "
          f"out {ma.output_size_in_bytes / GB:.2f} "
          f"temp {ma.temp_size_in_bytes / GB:.2f} GiB "
          f"(compile {time.time() - t0:.0f}s)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--decode-chunk", type=int, default=4)
    args = ap.parse_args()

    cfg = PipelineConfig(num_frames=200)
    cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
        cfg.inference, decode_chunk_size=args.decode_chunk))
    pipe = build_pipeline(cfg, seed=0, clip_cfg=CLIPVisionConfig(),
                          bf16=True, lazy=True)

    res = pipe._residency
    abstract = {f: jax.eval_shape(res.thunks[f]) for f in pipe._PARAM_FIELDS}
    for f, t in abstract.items():
        n = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(t))
        print(f"tree {f}: {n / GB:.2f} GiB")

    h, w = cfg.height, cfg.width
    inf = cfg.inference
    img = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    key = jax.eval_shape(lambda: generation_key(33, 0, True))

    cond_l = jax.jit(pipe._cond_impl).lower(
        abstract["conditioner_params"], img, key)
    report("conditioning", cond_l)
    c, uc = jax.eval_shape(pipe._cond_impl, abstract["conditioner_params"],
                           img, key)
    report("first_chunk", jax.jit(pipe._first_chunk_impl).lower(
        abstract["svd_unet_params"], c, uc, key))
    cs = dict(c)
    ucs = dict(uc)
    ctrl = jax.ShapeDtypeStruct(
        (1, inf.num_conditional_frames, h, w, 3), jnp.float32)
    cs["ctrl_frames"] = ctrl
    ucs["ctrl_frames"] = ctrl
    report("stream_chunk", jax.jit(pipe._stream_chunk_impl).lower(
        abstract["unet_params"], abstract["controlnet_params"], cs, ucs, key))
    for n in {args.decode_chunk, 1}:
        z = jax.ShapeDtypeStruct((1, n, h // 8, w // 8, 4), jnp.float32)
        report(f"decode{n}", jax.jit(pipe._decode_chunk_impl).lower(
            abstract["vae_params"], z))


if __name__ == "__main__":
    main()
