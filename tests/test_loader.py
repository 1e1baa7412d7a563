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
