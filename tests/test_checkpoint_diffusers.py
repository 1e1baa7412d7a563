"""Diffusers/HF-layout mapping coverage tests against real module trees."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import VAEConfig
from streamingt2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
from streamingt2v_tpu.models.clip_text import CLIPTextConfig, CLIPTextTower
from streamingt2v_tpu.models.enhance.unet import I2VGenXLUNet, I2VGenXLUNetConfig
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.utils.checkpoint import (
    convert_state_dict,
    coverage_report,
    flatten_params,
)
from streamingt2v_tpu.utils.checkpoint_diffusers import (
    diffusers_vae_map,
    hf_clip_text_map,
    hf_clip_vision_map,
    i2vgen_unet_map,
)


def test_diffusers_vae_map_coverage():
    cfg = dataclasses.replace(VAEConfig.tiny(), temporal_decoder=False)
    vae = AutoencoderKL(cfg, use_quant_conv=True)
    params = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)))
    unmapped, extra = coverage_report(diffusers_vae_map(cfg), params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_diffusers_vae_map_coverage_production():
    cfg = dataclasses.replace(VAEConfig(), temporal_decoder=False)
    vae = AutoencoderKL(cfg, use_quant_conv=True)
    params = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    unmapped, extra = coverage_report(diffusers_vae_map(cfg), params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_hf_clip_text_map_coverage():
    cfg = CLIPTextConfig.tiny()
    tower = CLIPTextTower(cfg)
    params = jax.eval_shape(tower.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, cfg.max_length), jnp.int32))
    unmapped, extra = coverage_report(hf_clip_text_map(cfg), params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_hf_clip_vision_map_coverage_and_fused_qkv():
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg)
    params = jax.eval_shape(tower.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    mapping = hf_clip_vision_map(cfg)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])

    # fused q/k/v conversion produces the right concatenation
    rng = np.random.RandomState(0)
    w = cfg.width
    sd = {}
    flat = flatten_params(params["params"])
    for fx, (tk, _) in mapping.items():
        keys = tk if isinstance(tk, tuple) else (tk,)
        for k in keys:
            if k not in sd:
                if "q_proj.weight" in k or "k_proj.weight" in k or "v_proj.weight" in k:
                    sd[k] = rng.randn(w, w).astype(np.float32)
                elif k.endswith("bias") and "proj.bias" in k and "self_attn" in k and "out" not in k:
                    sd[k] = rng.randn(w).astype(np.float32)
                else:
                    t = flat[fx]
                    if isinstance(tk, tuple):
                        continue
                    # invert simple transforms by shape
                    if t.ndim == 2 and "embedding" not in fx and fx != "positional_embedding":
                        sd[k] = rng.randn(t.shape[1], t.shape[0]).astype(np.float32)
                    elif t.ndim == 4:
                        sd[k] = rng.randn(t.shape[3], t.shape[2], t.shape[0], t.shape[1]).astype(np.float32)
                    else:
                        sd[k] = rng.randn(*t.shape).astype(np.float32)
    variables, missing = convert_state_dict(sd, mapping, params, strict=True)
    assert missing == []
    layer0 = variables["params"]["resblock_0"]["attn"]["in_proj"]
    qw = sd["vision_model.encoder.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_array_equal(np.asarray(layer0["kernel"])[:, :w], qw.T)


def test_i2vgen_unet_map_coverage_tiny():
    cfg = I2VGenXLUNetConfig.tiny()
    unet = I2VGenXLUNet(cfg)
    args = (
        jnp.zeros((1, 2, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
        jnp.zeros((1, 2, 8, 8, 4)), jnp.zeros((1, 16)),
        jnp.zeros((1, 5, cfg.cross_attention_dim)),
    )
    params = jax.eval_shape(unet.init, jax.random.PRNGKey(0), *args)
    unmapped, extra = coverage_report(i2vgen_unet_map(cfg), params)
    assert unmapped == [], f"params with no mapping: {unmapped[:10]}"
    assert extra == [], f"mapped but absent: {extra[:10]}"


def test_i2vgen_unet_map_coverage_production():
    cfg = I2VGenXLUNetConfig()
    unet = I2VGenXLUNet(cfg)
    args = (
        jnp.zeros((1, 2, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
        jnp.zeros((1, 2, 8, 8, 4)), jnp.zeros((1, 1024)),
        jnp.zeros((1, 5, cfg.cross_attention_dim)),
    )
    params = jax.eval_shape(unet.init, jax.random.PRNGKey(0), *args)
    unmapped, extra = coverage_report(i2vgen_unet_map(cfg), params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_svd_unet_map_coverage():
    from streamingt2v_tpu.config import VideoUNetConfig
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.utils.checkpoint_diffusers import svd_unet_map

    for cfg in (VideoUNetConfig.tiny(controlnet_mode=False),
                dataclasses.replace(VideoUNetConfig(), controlnet_mode=False)):
        unet = VideoUNet(cfg)
        params = jax.eval_shape(
            unet.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.zeros((1,)),
            jnp.zeros((1, 2, 1, cfg.context_dim)),
            jnp.zeros((1, 2, cfg.adm_in_channels)),
        )
        unmapped, extra = coverage_report(svd_unet_map(cfg), params)
        assert unmapped == [], f"params with no mapping: {unmapped[:10]}"
        assert extra == [], f"mapped but absent: {extra[:10]}"
