"""Loader integration: synthetic checkpoints through the real load paths."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import PipelineConfig, VFIConfig
from streamingt2v_tpu.utils.checkpoint import flatten_params
from streamingt2v_tpu.utils.loader import (
    load_interpolate_pipeline,
    resolve_ckpt,
)


def test_resolve_ckpt_local_and_missing(tmp_path):
    f = tmp_path / "x.safetensors"
    f.write_bytes(b"")
    assert resolve_ckpt(str(f)) == str(f)
    with pytest.raises(FileNotFoundError, match="Download it out-of-band"):
        resolve_ckpt(str(tmp_path / "missing.pkl"), "some/source")


def _fake_sd_for(mapping, template, rng):
    """Invert a mapping: synthesize torch-side arrays whose shapes convert
    to the flax template's (rank-based inversion of t_conv2d/3d/linear)."""
    flat = flatten_params(template["params"])
    sd = {}
    for fx, (tk, _transform) in mapping.items():
        if fx not in flat:  # e.g. cond_encoder has no decoder params
            continue
        t = flat[fx]
        if t.ndim == 4:
            shape = (t.shape[3], t.shape[2], t.shape[0], t.shape[1])
        elif t.ndim == 5:
            shape = (t.shape[4], t.shape[3], t.shape[0], t.shape[1], t.shape[2])
        elif t.ndim == 2:
            shape = (t.shape[1], t.shape[0])
        else:
            shape = tuple(t.shape)
        sd[tk] = rng.randn(*shape).astype(np.float32)
    return sd


def _write_streamingsvd_ckpt(cfg, models, ckpt_dir):
    """Synthesize the whole-trainer safetensors checkpoint for a tiny
    pipeline (UNet + ControlNet + VAE + conditioner cond_encoder)."""
    import dataclasses

    from safetensors.numpy import save_file

    from streamingt2v_tpu.utils import checkpoint as ck

    rng = np.random.RandomState(0)
    sd = {}
    sd.update(_fake_sd_for(ck.unet_map(cfg.unet), models.unet_params, rng))
    sd.update(_fake_sd_for(ck.controlnet_map(cfg.unet, cfg.controlnet),
                           models.controlnet_params, rng))
    sd.update(_fake_sd_for(ck.vae_map(cfg.vae, torch_prefix="first_stage_model"),
                           models.vae_params, rng))
    vcfg = dataclasses.replace(cfg.vae, temporal_decoder=False, scale_factor=1.0)
    cond_tmpl = {"params": models.conditioner_params["params"]["cond_encoder"]}
    sd.update(_fake_sd_for(
        ck.vae_map(vcfg, torch_prefix="conditioner.embedders.3.encoder",
                   use_quant_conv=True), cond_tmpl, rng))
    os.makedirs(os.path.join(ckpt_dir, "streamingsvd"), exist_ok=True)
    save_file(sd, os.path.join(ckpt_dir, "streamingsvd", "model.safetensors"))
    return sd


@pytest.mark.slow
def test_load_stage1_checkpoints_fallback_strips_cam(tmp_path):
    """Without svd_xt/, the first-chunk UNet takes the streaming UNet's base
    weights with the CAM mergers stripped."""
    from streamingt2v_tpu.pipeline.build import build_pipeline
    from streamingt2v_tpu.utils.loader import load_stage1_checkpoints

    cfg = PipelineConfig.tiny()
    pipe = build_pipeline(cfg, seed=0)
    sd = _write_streamingsvd_ckpt(cfg, pipe.models, str(tmp_path))

    loaded = load_stage1_checkpoints(pipe, str(tmp_path))
    m = loaded.models
    assert not any(k.startswith("cam_merger") for k in m.svd_unet_params["params"])
    a = flatten_params(m.svd_unet_params["params"])["in_conv/kernel"]
    b = flatten_params(m.unet_params["params"])["in_conv/kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the streaming UNet actually took the checkpoint values
    ref = sd["model.diffusion_model.input_blocks.0.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(b), ref)


@pytest.mark.slow
def test_load_stage1_checkpoints_svd_xt_wiring(tmp_path):
    """With svd_xt/unet/ present, the first-chunk UNet converts the
    diffusers-layout SVD-XT weights (VideoUNet controlnet_mode=False)."""
    import dataclasses

    import torch

    from streamingt2v_tpu.pipeline.build import build_pipeline
    from streamingt2v_tpu.utils import checkpoint_diffusers as ckd
    from streamingt2v_tpu.utils.loader import load_stage1_checkpoints

    cfg = PipelineConfig.tiny()
    pipe = build_pipeline(cfg, seed=0)
    _write_streamingsvd_ckpt(cfg, pipe.models, str(tmp_path))

    svd_cfg = dataclasses.replace(cfg.unet, controlnet_mode=False)
    rng = np.random.RandomState(7)
    svd_sd = _fake_sd_for(ckd.svd_unet_map(svd_cfg), pipe.models.svd_unet_params, rng)
    os.makedirs(tmp_path / "svd_xt" / "unet")
    torch.save({k: torch.from_numpy(v) for k, v in svd_sd.items()},
               str(tmp_path / "svd_xt" / "unet" / "diffusion_pytorch_model.bin"))

    loaded = load_stage1_checkpoints(pipe, str(tmp_path))
    got = flatten_params(loaded.models.svd_unet_params["params"])["in_conv/kernel"]
    ref = svd_sd["conv_in.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.slow
def test_load_interpolate_pipeline_from_synthetic_pkl(tmp_path):
    """Build a fake torch 'ours.pkl' with the reference's module.-prefixed
    names, load it through the real path, and check weights land."""
    import torch

    from streamingt2v_tpu.models.vfi import MultiScaleFlow
    from streamingt2v_tpu.utils.checkpoint_vfi import t_deconv, vfi_map

    cfg = PipelineConfig.tiny()
    vficfg = cfg.vfi
    model = MultiScaleFlow(vficfg)
    img = jnp.zeros((1, 64, 64, 3))
    tmpl = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)
    flat = flatten_params(tmpl["params"])
    mapping = vfi_map(vficfg)

    rng = np.random.RandomState(0)
    sd = {}
    for fx, (tk, transform) in mapping.items():
        t = flat[fx]
        if transform is t_deconv:
            shape = (t.shape[2], t.shape[3], t.shape[0], t.shape[1])
        elif t.ndim == 4:
            shape = (t.shape[3], t.shape[2], t.shape[0], t.shape[1])
        elif t.ndim == 5:
            shape = (t.shape[4], t.shape[3], t.shape[0], t.shape[1], t.shape[2])
        elif t.ndim == 2:
            shape = (t.shape[1], t.shape[0])
        else:
            shape = tuple(t.shape)
        sd["module." + tk] = torch.from_numpy(rng.randn(*shape).astype(np.float32))
    # DDP artifacts the reference filters out (Trainer.py:36-47)
    sd["module.feature_bone.block4.0.attn_mask"] = torch.zeros(1)
    sd["module.feature_bone.block4.0.HW"] = torch.zeros(1)

    ckpt_dir = tmp_path / "ckpts"
    os.makedirs(ckpt_dir / "vfi")
    torch.save(sd, str(ckpt_dir / "vfi" / "ours.pkl"))

    pipe = load_interpolate_pipeline(cfg, str(ckpt_dir))
    # loaded weights actually run
    video = jnp.asarray(np.random.RandomState(1).rand(3, 32, 32, 3), jnp.float32)
    out = pipe.interpolate_video(video)
    assert out.shape == (5, 32, 32, 3)
    # spot-check one tensor took the mapped value
    loaded = flatten_params(pipe.params["params"])
    w = np.asarray(loaded["unet/conv/kernel"])
    ref = sd["module.unet.conv.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(w, ref)
