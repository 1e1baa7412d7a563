"""Stage-2 enhancement tests: DDIM scheduler properties, I2VGen-XL UNet,
tokenizer, and the SDEdit/randomized-blending pipeline on tiny configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import EnhanceConfig, VAEConfig
from streamingt2v_tpu.diffusion.ddim import DDIMConfig, DDIMScheduler
from streamingt2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
from streamingt2v_tpu.models.clip_text import CLIPTextConfig, CLIPTextTower, CLIPTokenizer
from streamingt2v_tpu.models.enhance.unet import (
    I2VGenXLUNet,
    I2VGenXLUNetConfig,
    adaptive_avg_pool_2d,
)
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.pipeline.enhance import EnhanceModels, EnhancePipeline, center_crop_wide


# ---------------- DDIM ----------------

pytestmark = pytest.mark.slow


def test_ddim_timesteps_leading():
    s = DDIMScheduler(DDIMConfig(num_train_timesteps=1000, steps_offset=1))
    ts = s.timesteps(10)
    assert ts[0] == 901 and ts[-1] == 1 and len(ts) == 10


def test_ddim_sdedit_truncation():
    s = DDIMScheduler()
    ts = s.sdedit_timesteps(30, 0.97)
    # init_timestep = min(int(30*0.97), 30) = 29 -> t_start 1 -> 29 steps
    assert len(ts) == 29


def test_ddim_add_noise_then_full_denoise_recovers():
    """With the true epsilon as model output, iterating DDIM steps from the
    first timestep recovers x0 exactly (deterministic sampler identity)."""
    n = 10
    x0 = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 2), jnp.float32)
    noise = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 2), jnp.float32)

    def run(scheduler):
        ts = scheduler.timesteps(n)
        x = scheduler.add_noise(x0, noise, int(ts[0]))
        for t in ts:
            acp = scheduler.alphas_cumprod[int(t)]
            eps = (x - np.sqrt(acp) * x0) / np.sqrt(1 - acp)  # exact epsilon
            x = scheduler.step(eps, int(t), x, n)
        return np.asarray(x)

    # set_alpha_to_one=True: exact recovery
    out = run(DDIMScheduler(DDIMConfig(set_alpha_to_one=True)))
    np.testing.assert_allclose(out, np.asarray(x0), atol=1e-4)
    # default (False): final noise floor sqrt(1 - acp[0]) * noise remains
    s = DDIMScheduler()
    out = run(s)
    fa = s.final_alpha_cumprod
    expected = np.sqrt(fa) * np.asarray(x0) + np.sqrt(1 - fa) * np.asarray(noise)
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_ddim_from_config_ignores_unknown():
    s = DDIMScheduler.from_config(
        {"beta_schedule": "linear", "num_train_timesteps": 100, "_class_name": "DDIMScheduler"}
    )
    assert s.cfg.beta_schedule == "linear" and s.cfg.num_train_timesteps == 100


def test_adaptive_avg_pool_matches_mean():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 12, 2), jnp.float32)
    out = adaptive_avg_pool_2d(x, (4, 4))
    ref = np.asarray(x).reshape(1, 4, 2, 4, 3, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


# ---------------- UNet ----------------

def _unet_inputs(cfg, b=2, t=3, h=8, w=8):
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(b, t, h, w, 4), jnp.float32),
        jnp.full((b,), 500, jnp.int32),
        jnp.full((b,), 16.0),
        jnp.asarray(rng.randn(b, t, h, w, 4), jnp.float32),
        jnp.asarray(rng.randn(b, cfg.cross_attention_dim), jnp.float32),
        jnp.asarray(rng.randn(b, 5, cfg.cross_attention_dim), jnp.float32),
    )


def test_i2vgen_unet_shapes():
    cfg = I2VGenXLUNetConfig.tiny()
    unet = I2VGenXLUNet(cfg)
    args = _unet_inputs(cfg)
    params = unet.init(jax.random.PRNGKey(0), *args)
    out = unet.apply(params, *args)
    assert out.shape == (2, 3, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_i2vgen_unet_temporal_mixing():
    cfg = I2VGenXLUNetConfig.tiny()
    unet = I2VGenXLUNet(cfg)
    args = list(_unet_inputs(cfg, b=1))
    params = unet.init(jax.random.PRNGKey(0), *args)
    out1 = unet.apply(params, *args)
    args2 = list(args)
    args2[0] = args[0].at[0, 0].add(1.0)
    out2 = unet.apply(params, *args2)
    assert not np.allclose(np.asarray(out1[0, 2]), np.asarray(out2[0, 2]))


# ---------------- tokenizer ----------------

def test_tokenizer_bpe_roundtrip():
    # toy vocab: byte-level chars + a merge
    chars = "abcdefghijklmnopqrstuvwxyz"
    vocab = {c: i for i, c in enumerate(chars)}
    vocab.update({f"{c}</w>": 100 + i for i, c in enumerate(chars)})
    vocab["hi</w>"] = 200
    vocab["<|startoftext|>"] = 300
    vocab["<|endoftext|>"] = 301
    merges = [("h", "i</w>")]
    tok = CLIPTokenizer(vocab, merges, max_length=8)
    ids = tok(["hi hi"])
    assert ids.shape == (1, 8)
    assert ids[0, 0] == 300 and ids[0, 1] == 200 and ids[0, 2] == 200 and ids[0, 3] == 301
    assert np.all(ids[0, 4:] == 301)  # eot padding


def test_tokenizer_synthetic():
    """Byte-level fallback tokenizer: stable framing, ids inside the
    production 49408 vocab, deterministic across constructions."""
    tok = CLIPTokenizer.synthetic()
    ids = np.asarray(tok(["High Quality, HQ, detailed.", ""]))
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.sot and ids[1, 0] == tok.sot
    assert ids[1, 1] == tok.eot and np.all(ids[1, 2:] == tok.eot)
    assert ids.max() < 49408
    ids2 = np.asarray(CLIPTokenizer.synthetic()(["High Quality, HQ, detailed.", ""]))
    np.testing.assert_array_equal(ids, ids2)


def test_clip_text_tower():
    cfg = CLIPTextConfig.tiny()
    tower = CLIPTextTower(cfg)
    ids = jnp.zeros((2, cfg.max_length), jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids)
    out = tower.apply(params, ids)
    assert out.shape == (2, cfg.max_length, cfg.width)


def test_clip_text_causality():
    """Changing a later token must not affect earlier positions."""
    cfg = CLIPTextConfig.tiny()
    tower = CLIPTextTower(cfg)
    ids1 = jnp.zeros((1, 8), jnp.int32)
    ids2 = ids1.at[0, 5].set(3)
    params = tower.init(jax.random.PRNGKey(0), ids1)
    o1 = tower.apply(params, ids1)
    o2 = tower.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(o1[0, :5]), np.asarray(o2[0, :5]), atol=1e-6)
    assert not np.allclose(np.asarray(o1[0, 5]), np.asarray(o2[0, 5]))


# ---------------- pipeline ----------------

@pytest.fixture(scope="module")
def enhance_pipeline():
    ucfg = I2VGenXLUNetConfig.tiny()
    vcfg = dataclasses.replace(VAEConfig.tiny(), temporal_decoder=False)
    ccfg = CLIPVisionConfig.tiny()
    tcfg = CLIPTextConfig.tiny()
    cfg = EnhanceConfig(
        num_steps=3, height=32, width=32, chunk_size=4, overlap_size=2,
        use_randomized_blending=True,
    )
    unet = I2VGenXLUNet(ucfg)
    vae = AutoencoderKL(vcfg, use_quant_conv=True)
    clipv = CLIPVisionTower(ccfg)
    text = CLIPTextTower(tcfg)
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    h = cfg.height // vcfg.downsample_factor
    w = cfg.width // vcfg.downsample_factor
    uparams = unet.init(
        k[0], jnp.zeros((2, 4, h, w, 4)), jnp.zeros((2,), jnp.int32), jnp.zeros((2,)),
        jnp.zeros((2, 4, h, w, 4)), jnp.zeros((2, ccfg.output_dim)),
        jnp.zeros((2, 5, ucfg.cross_attention_dim)),
    )
    vparams = vae.init(k[1], jnp.zeros((1, 32, 32, 3)))
    cvparams = clipv.init(k[2], jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3)))
    tparams = text.init(k[3], jnp.zeros((1, tcfg.max_length), jnp.int32))
    models = EnhanceModels(
        unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
        clip_vision=clipv, clip_vision_params=cvparams,
        text_encoder=text, text_params=tparams,
        scheduler=DDIMScheduler(),
    )
    # tiny CLIP text width != UNet cross dim; pass precomputed embeds instead
    return EnhancePipeline(cfg, models), ucfg


def test_enhance_no_blending(enhance_pipeline):
    pipe, ucfg = enhance_pipeline
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)
    image = jnp.asarray(rng.rand(32, 32, 3) * 2 - 1, jnp.float32)
    pe = jnp.asarray(rng.randn(2, 7, ucfg.cross_attention_dim), jnp.float32)
    out = pipe.enhance(video, [image], prompt_embeds=pe, use_randomized_blending=False)
    assert out.shape == (4, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_enhance_randomized_blending(enhance_pipeline):
    pipe, ucfg = enhance_pipeline
    rng = np.random.RandomState(0)
    # 8 frames, chunk 4, overlap 2 -> 3 chunks
    video = jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)
    keys = [jnp.asarray(rng.rand(32, 32, 3) * 2 - 1, jnp.float32) for _ in range(3)]
    pe = jnp.asarray(rng.randn(2, 7, ucfg.cross_attention_dim), jnp.float32)
    out = pipe.enhance(video, keys, prompt_embeds=pe, use_randomized_blending=True)
    assert out.shape == (8, 32, 32, 3)
    # bitwise-stable chunk scheduling
    out2 = pipe.enhance(video, keys, prompt_embeds=pe, use_randomized_blending=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_enhance_bad_chunking_raises(enhance_pipeline):
    pipe, ucfg = enhance_pipeline
    video = jnp.zeros((7, 32, 32, 3))
    pe = jnp.zeros((2, 7, ucfg.cross_attention_dim))
    with pytest.raises(AssertionError, match="not divisible"):
        pipe.enhance(video, [video[0]] * 2, prompt_embeds=pe, use_randomized_blending=True)


def test_center_crop_wide():
    img = jnp.arange(5 * 8 * 1, dtype=jnp.float32).reshape(5, 8, 1)
    out = center_crop_wide(img, (4, 3))
    assert out.shape == (3, 4, 1)


def test_enhance_per_step_equals_one_program(enhance_pipeline):
    """Per-step dispatch (default) and the whole-video scan compile
    granularities produce identical latents (same on-device offset PRNG)."""
    import dataclasses as dc

    pipe, ucfg = enhance_pipeline
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)
    keys = [jnp.asarray(rng.rand(32, 32, 3) * 2 - 1, jnp.float32) for _ in range(3)]
    pe = jnp.asarray(rng.randn(2, 7, ucfg.cross_attention_dim), jnp.float32)
    out_step = pipe.enhance(video, keys, prompt_embeds=pe,
                            use_randomized_blending=True)
    one = EnhancePipeline(dc.replace(pipe.cfg, one_program=True), pipe.m)
    out_scan = one.enhance(video, keys, prompt_embeds=pe,
                           use_randomized_blending=True)
    np.testing.assert_allclose(np.asarray(out_step), np.asarray(out_scan),
                               atol=1e-5, rtol=1e-5)


def test_enhance_dp_sharded_equals_sequential(enhance_pipeline):
    """Multi-chip stage 2: the DP path (all (chunk x CFG) UNet forwards
    batched, batch sharded over the mesh 'data' axis) matches the
    single-chip sequential path — same randomized offsets, same write-back
    order (4 virtual devices)."""
    from streamingt2v_tpu.config import MeshConfig
    from streamingt2v_tpu.parallel.mesh import create_mesh

    import dataclasses as dc

    pipe, ucfg = enhance_pipeline
    rng = np.random.RandomState(2)
    video = jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)
    keys = [jnp.asarray(rng.rand(32, 32, 3) * 2 - 1, jnp.float32) for _ in range(3)]
    pe = jnp.asarray(rng.randn(2, 7, ucfg.cross_attention_dim), jnp.float32)
    # f32 VAE decode for a tight comparison: the DP batch crosses the
    # grouped-attention dispatch threshold (fold >= 256) that the
    # sequential B=1 calls do not, so latents agree to kernel numerics
    # (~1e-6), not bitwise — bf16 decode would quantize that into
    # multi-ulp steps
    cfg32 = dc.replace(pipe.cfg, vae_bf16=False)
    out_seq = EnhancePipeline(cfg32, pipe.m).enhance(
        video, keys, prompt_embeds=pe, use_randomized_blending=True)

    mesh = create_mesh(MeshConfig(data=4))
    dp = EnhancePipeline(cfg32, pipe.m, mesh=mesh)
    out_dp = dp.enhance(video, keys, prompt_embeds=pe,
                        use_randomized_blending=True)
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_seq),
                               atol=2e-4, rtol=2e-4)
