"""Benchmarks for the BASELINE.md configs on one TPU chip.

Default (driver mode, no args): config #2 — single-chunk StreamingSVD
guided denoise step at the production geometry.  Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Other configs via --mode:
  vae      (#1) temporal-VAE round-trip, 16-frame 576x1024 chunk
  denoise  (#2) single-chunk guided denoise step (default)
  stage1   (#3) 200-frame-target autoregressive stage 1 (first chunk +
                streaming chunks, conditioner+sampler+decode included)
  enhance  (#4) I2VGen-XL enhancement, randomized blending chunk 38/overlap 12
  full     (#5) stage1 -> enhance -> VFI 2x -> uint8 frames

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
baselines are estimated A100 fp16 figures for the same computation,
derived from typical public SVD-XT / I2VGen-XL timings (see BASELINE.md).

Timing methodology: on this environment's tunneled TPU platform,
jax.block_until_ready does NOT synchronize; only host reads do, and each
carries a ~30 ms RPC round-trip.  Hot loops chain K steps inside one jit,
read one scalar, subtract the measured round-trip, and divide by K; whole-
pipeline modes time end-to-end wall clock minus compile.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS_PER_CHUNK = 30  # config.yaml:150

# Estimated A100 fp16 reference throughputs (frames/s) per config.
BASELINES = {
    # 25-frame SVD-XT+ControlNet forward x 30 EDM steps ~= 60 s/chunk.
    "denoise": 0.42,
    # SD-VAE encode+temporal decode, ~40ms+90ms per 576x1024 frame.
    "vae": 7.7,
    # stage-1 = first chunk (25 steps) + ceil((100-25)/18)=5 AR chunks:
    # ~6 chunks x ~60s -> 100 frames / 360s.
    "stage1": 0.28,
    # I2VGen-XL 720p: 30 DDIM steps x CFG-doubled 38-frame UNet ~= 110s
    # per chunk on A100 -> 0.35 frames/s.
    "enhance": 0.35,
    # full pipeline: ~8 min for 200 frames at 720p24 on A100 (~0.4 f/s).
    "full": 0.4,
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def peak_hbm_gb() -> float:
    """Device-reported peak HBM (GiB); 0.0 if the platform exposes no stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use") or 0
        return round(peak / 2**30, 2)
    except Exception:
        return 0.0


RECORDS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "bench_records.json")


def emit(metric: str, value: float, unit: str, baseline: float) -> None:
    rec = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2),
    }
    hbm = peak_hbm_gb()
    if hbm:
        rec["peak_hbm_gb"] = hbm
    _record(dict(rec))
    print(json.dumps(rec))


def _record(rec: dict) -> None:
    """Persist the latest real-chip result per metric so the driver-mode
    run can replay every config's recorded number (the driver records the
    bench output tail — numbers printed there are round-over-round
    evidence instead of prose claims)."""
    try:
        recs = {}
        if os.path.exists(RECORDS_PATH):
            with open(RECORDS_PATH) as f:
                recs = json.load(f)
        rec["recorded_at"] = time.strftime("%Y-%m-%d")
        rec["device"] = str(jax.devices()[0])
        recs[rec["metric"]] = rec
        with open(RECORDS_PATH, "w") as f:
            json.dump(recs, f, indent=1, sort_keys=True)
    except Exception as e:  # recording must never fail the bench
        log(f"record skip: {e}")


def replay_records(exclude: str) -> None:
    """Print previously recorded real-chip results (one compact JSON line
    each, marked "recorded": true).  The FINAL stdout line stays the
    canonical live metric."""
    try:
        with open(RECORDS_PATH) as f:
            recs = json.load(f)
    except Exception:
        return
    for metric in sorted(recs):
        if metric == exclude:
            continue
        rec = dict(recs[metric])
        rec["recorded"] = True
        print(json.dumps(rec))


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


def to_bf16(p):
    # ONE jitted program for the whole tree (donated): the eager per-leaf
    # form dispatches one ~30ms-RTT program per distinct shape on the
    # tunneled platform (~700 shapes for a UNet tree)
    return jax.jit(
        lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
        ),
        donate_argnums=0,
    )(p)


# ---------------------------------------------------------------------------
# config #2 — single-chunk denoise step (the driver default)
# ---------------------------------------------------------------------------

def bench_denoise() -> None:
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
    uparams, cparams = to_bf16(uparams), to_bf16(cparams)
    log(f"init {time.time() - t0:.0f}s")

    cond = {"concat": cc, "crossattn": ctx, "vector": y, "ctrl_frames": pix}
    K = 3  # chained steps per timed call

    @jax.jit
    def k_steps(uparams, cparams, x0, cond):
        net = streaming_wrapper(unet, uparams, cn, cparams, FC, ctrl_cfg_shared=True)

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
    log(f"per-step {per_step * 1000:.0f}ms, chunk({STEPS_PER_CHUNK} steps) {chunk_time:.1f}s")
    emit("stage1_denoise_frames_per_sec_per_chip", T / chunk_time, "frames/s",
         BASELINES["denoise"])


# ---------------------------------------------------------------------------
# config #1 — temporal-VAE round-trip
# ---------------------------------------------------------------------------

def bench_vae() -> None:
    from streamingt2v_tpu.config import VAEConfig
    from streamingt2v_tpu.models.vae import AutoencoderKL

    log(f"devices: {jax.devices()}")
    cfg = VAEConfig()  # production: fp32 VAE compute (disable_first_stage_autocast)
    vae = AutoencoderKL(cfg)
    T, H, W = 16, 576, 1024
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 2, 64, 64, 3) * 2 - 1, jnp.float32)
    t0 = time.time()
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), video)
    log(f"init {time.time() - t0:.0f}s")

    chunk = jnp.asarray(rng.rand(1, T, H, W, 3) * 2 - 1, jnp.float32)

    # Chunked like the reference pipeline: encode per 8 frames, temporal
    # decode per 4 (streaming_svd.py:123-151 decode_chunk_size; a 16-frame
    # f32 whole-roundtrip program needs ~18 GB of HBM and cannot fit).
    @jax.jit
    def roundtrip(params, x, key):
        zs = []
        for i in range(0, T, 8):
            xe = x[:, i:i + 8].reshape((-1,) + x.shape[2:])
            zi = vae.apply(params, xe, key, method="encode")
            zs.append(zi.reshape((1, -1) + zi.shape[1:]))
        z = jnp.concatenate(zs, axis=1)
        ys = []
        for i in range(0, T, 4):
            ys.append(vae.apply(params, z[:, i:i + 4], method="decode"))
        return jnp.concatenate(ys, axis=1)[0, 0, 0, 0, 0]

    rtt = measure_rtt()
    t0 = time.time()
    float(roundtrip(params, chunk, jax.random.PRNGKey(1)))
    log(f"compile+first run {time.time() - t0:.0f}s")
    ts = []
    for i in range(5):
        t0 = time.time()
        float(roundtrip(params, chunk + 0.001 * i, jax.random.PRNGKey(i)))
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2] - rtt
    log(f"roundtrip({T} frames @ {H}x{W}) {dt * 1000:.0f}ms")
    emit("vae_roundtrip_frames_per_sec_per_chip", T / dt, "frames/s", BASELINES["vae"])


# ---------------------------------------------------------------------------
# config #3 — autoregressive stage 1 (200-frame pipeline target)
# ---------------------------------------------------------------------------

def _build_stage1(num_frames: int = 200):
    import dataclasses

    from streamingt2v_tpu.config import PipelineConfig
    from streamingt2v_tpu.models.clip import CLIPVisionConfig
    from streamingt2v_tpu.pipeline.build import build_pipeline

    cfg = PipelineConfig(num_frames=num_frames)
    t0 = time.time()
    pipe = build_pipeline(cfg, seed=0, clip_cfg=CLIPVisionConfig())
    # conditioner (CLIP ViT-H + cond-VAE) in bf16 too: the reference runs
    # its embedders under fp16 autocast; the f32 tower costs 2.5 GB of HBM
    pipe.models = dataclasses.replace(
        pipe.models,
        unet_params=to_bf16(pipe.models.unet_params),
        controlnet_params=to_bf16(pipe.models.controlnet_params),
        svd_unet_params=to_bf16(pipe.models.svd_unet_params),
        conditioner_params=to_bf16(pipe.models.conditioner_params),
    )
    log(f"build+init {time.time() - t0:.0f}s")
    return cfg, pipe


def bench_stage1() -> None:
    log(f"devices: {jax.devices()}")
    cfg, pipe = _build_stage1(200)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(cfg.height, cfg.width, 3) * 2 - 1, jnp.float32)

    target = cfg.stage1_frames  # 100
    t0 = time.time()
    video = pipe.image_to_video(image, num_frames=target, seed=33)
    np.asarray(video[-1, 0, 0])  # sync
    compile_and_run = time.time() - t0
    log(f"first full stage1 (compile+run) {compile_and_run:.0f}s")

    t0 = time.time()
    video = pipe.image_to_video(image * 0.99, num_frames=target, seed=34)
    np.asarray(video[-1, 0, 0])
    dt = time.time() - t0
    log(f"stage1 {target} frames in {dt:.1f}s")
    emit("stage1_autoregressive_frames_per_sec_per_chip", target / dt, "frames/s",
         BASELINES["stage1"])


# ---------------------------------------------------------------------------
# config #4 — enhancement chunk (randomized blending geometry)
# ---------------------------------------------------------------------------

def _build_enhance():
    import dataclasses

    from streamingt2v_tpu.config import EnhanceConfig, VAEConfig
    from streamingt2v_tpu.diffusion.ddim import DDIMScheduler
    from streamingt2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from streamingt2v_tpu.models.clip_text import CLIPTextConfig, CLIPTextTower
    from streamingt2v_tpu.models.enhance.unet import I2VGenXLUNet, I2VGenXLUNetConfig
    from streamingt2v_tpu.models.vae import AutoencoderKL
    from streamingt2v_tpu.pipeline.enhance import EnhanceModels, EnhancePipeline

    cfg = EnhanceConfig()
    ucfg = I2VGenXLUNetConfig()
    vcfg = dataclasses.replace(VAEConfig(), temporal_decoder=False)
    unet = I2VGenXLUNet(ucfg)
    vae = AutoencoderKL(vcfg, use_quant_conv=True)
    clip_v = CLIPVisionTower(CLIPVisionConfig())
    clip_t = CLIPTextTower(CLIPTextConfig())

    t0 = time.time()
    h, w = 8, 8
    u_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)), jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1, 1024)),
        jnp.zeros((1, 77, 1024)),
    )
    v_params = jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    cv_params = jax.jit(clip_v.init)(jax.random.PRNGKey(2), jnp.zeros((1, 224, 224, 3)))
    ct_params = jax.jit(clip_t.init)(jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32))
    log(f"enhance init {time.time() - t0:.0f}s")

    # CLIP towers in bf16 (the reference runs them fp16): their f32 params
    # cost 3 GB of HBM that the 38-frame 720p UNet step needs.
    models = EnhanceModels(
        unet=unet, unet_params=to_bf16(u_params), vae=vae, vae_params=v_params,
        clip_vision=clip_v, clip_vision_params=to_bf16(cv_params),
        text_encoder=clip_t, text_params=to_bf16(ct_params),
        scheduler=DDIMScheduler(),
    )
    return cfg, EnhancePipeline(cfg, models)


def bench_enhance() -> None:
    log(f"devices: {jax.devices()}")
    cfg, pipe = _build_enhance()
    rng = np.random.RandomState(0)
    # blending geometry: 2 chunks of 38 with overlap 12 -> 64 frames @720p
    F = 2 * (cfg.chunk_size - cfg.overlap_size) + cfg.overlap_size  # 64
    # host-side input: the pipeline device-puts per VAE chunk — keeps the
    # 944 MB f32 video out of HBM for the whole denoise
    video = (rng.rand(F, cfg.height, cfg.width, 3) * 2 - 1).astype(np.float32)
    keys = [video[0], video[cfg.chunk_size - cfg.overlap_size]]
    pe = jnp.asarray(rng.randn(2, 77, 1024), jnp.bfloat16)

    t0 = time.time()
    out = pipe.enhance(video, keys, prompt_embeds=pe, use_randomized_blending=True)
    np.asarray(out[-1, 0, 0])
    log(f"first enhance (compile+run) {time.time() - t0:.0f}s")

    t0 = time.time()
    out = pipe.enhance(video * 0.99, keys, prompt_embeds=pe, use_randomized_blending=True)
    np.asarray(out[-1, 0, 0])
    dt = time.time() - t0
    log(f"enhance {F} frames @ {cfg.height}x{cfg.width} in {dt:.1f}s")
    emit("enhance_frames_per_sec_per_chip", F / dt, "frames/s", BASELINES["enhance"])


# ---------------------------------------------------------------------------
# config #5 — full pipeline (stage1 -> enhance -> VFI)
# ---------------------------------------------------------------------------

def bench_full() -> None:
    """Config #5, staged SEQUENTIALLY: each stage builds, compiles, runs a
    timed steady-state pass, then frees its params before the next stage —
    the three production model sets (~14 GB bf16 together) cannot
    co-reside with activations on one 16 GB chip.  The product path does
    the same via stage-sequential residency (pipeline/full.py +
    utils/residency.py); here the stages are never revisited, so freeing
    beats offloading.  Reported value = frames / sum of steady-state
    stage times."""
    import gc

    log(f"devices: {jax.devices()}")
    num_frames = 56  # scaled-down full run (7 stage-1 chunks' worth: 28->56)
    rng = np.random.RandomState(0)

    # ---- stage 1 ----
    cfg, stage1 = _build_stage1(num_frames)
    image = jnp.asarray(rng.rand(cfg.height, cfg.width, 3) * 2 - 1, jnp.float32)
    t0 = time.time()
    s1 = stage1.image_to_video(image, num_frames=cfg.stage1_frames, seed=33)
    np.asarray(s1[-1, 0, 0])
    log(f"stage1 compile+run {time.time() - t0:.0f}s")
    t0 = time.time()
    s1 = stage1.image_to_video(image * 0.99, num_frames=cfg.stage1_frames, seed=34)
    s1_host = np.asarray(s1)
    t_s1 = time.time() - t0
    log(f"stage1 {s1_host.shape[0]} frames {t_s1:.1f}s")
    del stage1, s1
    gc.collect()

    # ---- stage 2 ----
    ecfg, enhance = _build_enhance()
    pe = jnp.asarray(rng.randn(2, 77, 1024), jnp.bfloat16)
    up = np.asarray(jax.image.resize(
        jnp.asarray(s1_host),
        (s1_host.shape[0], ecfg.height, ecfg.width, 3), "bilinear"))
    t0 = time.time()
    enhanced = enhance.enhance(up, [up[0]], prompt_embeds=pe,
                               use_randomized_blending=False)
    np.asarray(enhanced[-1, 0, 0])
    log(f"enhance compile+run {time.time() - t0:.0f}s")
    t0 = time.time()
    enhanced = enhance.enhance(up * 0.99, [up[0]], prompt_embeds=pe,
                               use_randomized_blending=False)
    enh_host = np.asarray(enhanced)
    t_enh = time.time() - t0
    log(f"enhance {enh_host.shape[0]} frames {t_enh:.1f}s")
    del enhance, enhanced
    gc.collect()

    # ---- stage 3 ----
    from streamingt2v_tpu.config import VFIConfig
    from streamingt2v_tpu.models.vfi import MultiScaleFlow
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline

    vfi_model = MultiScaleFlow(VFIConfig())
    img = jnp.zeros((1, 256, 256, 3))
    vfi_params = jax.jit(vfi_model.init)(jax.random.PRNGKey(5), img, img)
    vfi = InterpolatePipeline(vfi_model, vfi_params, tta=True)
    ev = jnp.asarray(enh_host)
    t0 = time.time()
    out = vfi.interpolate_video(ev)
    np.asarray(out[-1, 0, 0])
    log(f"vfi compile+run {time.time() - t0:.0f}s")
    t0 = time.time()
    out = vfi.interpolate_video(ev * 0.99)
    out8 = np.asarray(jnp.clip((out + 1) * 127.5, 0, 255).astype(jnp.uint8))
    t_vfi = time.time() - t0
    log(f"vfi {out8.shape[0]} frames {t_vfi:.1f}s")

    dt = t_s1 + t_enh + t_vfi
    log(f"full pipeline: {out8.shape[0]} frames @ {out8.shape[1]}x{out8.shape[2]}"
        f" in {dt:.1f}s (s1 {t_s1:.1f} + enh {t_enh:.1f} + vfi {t_vfi:.1f})")
    emit("full_pipeline_frames_per_sec_per_chip", out8.shape[0] / dt, "frames/s",
         BASELINES["full"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="denoise",
                    choices=["denoise", "vae", "stage1", "enhance", "full"])
    args = ap.parse_args()
    if args.mode == "denoise":
        # driver mode: replay all recorded real-chip configs first; the
        # final line remains the canonical live config-#2 metric
        replay_records(exclude="stage1_denoise_frames_per_sec_per_chip")
    {"denoise": bench_denoise, "vae": bench_vae, "stage1": bench_stage1,
     "enhance": bench_enhance, "full": bench_full}[args.mode]()


if __name__ == "__main__":
    main()
