"""Checkpoint converter tests: mapping coverage against real model param
trees (tiny configs), transform correctness, synthetic round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import ControlNetConfig, VAEConfig, VideoUNetConfig
from streamingt2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
from streamingt2v_tpu.models.controlnet import ControlNet
from streamingt2v_tpu.models.vae import AutoencoderKL
from streamingt2v_tpu.models.video_unet import VideoUNet
from streamingt2v_tpu.utils.checkpoint import (
    clip_visual_map,
    controlnet_map,
    convert_state_dict,
    coverage_report,
    flatten_params,
    t_conv2d,
    unet_map,
    vae_map,
)


def _fake_state_dict(mapping, template):
    """Invert the mapping: synthesize torch tensors with the transposed
    shapes so `convert` reproduces the template shapes."""
    inv = {
        (lambda f: f)(None): None
    }
    flat = flatten_params(template["params"])
    sd = {}
    rng = np.random.RandomState(0)
    for fx, (tk, transform) in mapping.items():
        target = flat[fx]
        # find torch-side shape by inverting known transforms
        if transform is t_conv2d:
            shape = (target.shape[3], target.shape[2], target.shape[0], target.shape[1])
        elif target.ndim == 5:  # conv3d
            shape = (target.shape[4], target.shape[3], target.shape[0], target.shape[1], target.shape[2])
        elif target.ndim == 2:
            shape = (target.shape[1], target.shape[0])
        else:
            shape = tuple(target.shape)
        sd[tk] = rng.randn(*shape).astype(np.float32)
    return sd


def test_vae_mapping_full_coverage():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    mapping = vae_map(cfg, torch_prefix="first_stage_model")
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [], f"params with no mapping: {unmapped[:10]}"
    assert extra == [], f"mapped but absent: {extra[:10]}"


def test_vae_quant_variant_coverage():
    cfg = dataclasses.replace(VAEConfig.tiny(), temporal_decoder=False)
    vae = AutoencoderKL(cfg, use_quant_conv=True)
    params = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)))
    mapping = vae_map(cfg, torch_prefix="enc", use_quant_conv=True)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def _unet_template(cfg):
    unet = VideoUNet(cfg)
    return jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.zeros((1,)),
        jnp.zeros((1, 2, 1, cfg.context_dim)), jnp.zeros((1, 2, cfg.adm_in_channels)),
    )


@pytest.mark.parametrize("controlnet_mode", [False, True])
def test_unet_mapping_full_coverage(controlnet_mode):
    cfg = VideoUNetConfig.tiny(controlnet_mode=controlnet_mode)
    params = _unet_template(cfg)
    mapping = unet_map(cfg)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [], f"params with no mapping: {unmapped[:10]}"
    assert extra == [], f"mapped but absent: {extra[:10]}"


def test_unet_mapping_full_coverage_production_config():
    cfg = VideoUNetConfig()  # full SVD config incl. CAM mergers
    params = _unet_template(cfg)
    mapping = unet_map(cfg)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_controlnet_mapping_full_coverage():
    ucfg = VideoUNetConfig.tiny()
    ccfg = ControlNetConfig.tiny()
    cn = ControlNet(ucfg, ccfg)
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)
    params = jax.eval_shape(
        cn.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 8, 8, ucfg.in_channels)), jnp.zeros((1,)),
        jnp.zeros((1, 2, 1, ucfg.context_dim)), jnp.zeros((1, 2, ucfg.adm_in_channels)),
        jnp.zeros((1, 2, 8 * scale, 8 * scale, 3)),
    )
    mapping = controlnet_map(ucfg, ccfg)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_clip_mapping_full_coverage():
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg)
    params = jax.eval_shape(
        tower.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    mapping = clip_visual_map(cfg, "visual")
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def test_convert_roundtrip_and_transforms():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    template = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    mapping = vae_map(cfg, torch_prefix="fs")
    sd = _fake_state_dict(mapping, template)
    variables, missing = convert_state_dict(sd, mapping, template)
    assert missing == []
    # loaded params must run
    out = vae.apply(variables, jnp.zeros((1, 2, 16, 16, 3)))
    assert out.shape == (1, 2, 16, 16, 3)
    # conv transform check: torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    w_torch = sd["fs.encoder.conv_in.weight"]
    w_flax = np.asarray(variables["params"]["encoder"]["conv_in"]["kernel"])
    np.testing.assert_array_equal(w_flax, w_torch.transpose(2, 3, 1, 0))


def test_convert_shape_mismatch_raises():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    template = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    mapping = vae_map(cfg, torch_prefix="fs")
    sd = _fake_state_dict(mapping, template)
    sd["fs.encoder.conv_in.weight"] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_state_dict(sd, mapping, template)
