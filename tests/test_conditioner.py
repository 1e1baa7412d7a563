"""Conditioner + CLIP tower tests (tiny configs)."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import ConditionerConfig, VAEConfig
from streamingt2v_tpu.models.clip import (
    CLIPVisionConfig,
    CLIPVisionTower,
    clip_preprocess,
)
from streamingt2v_tpu.models.conditioner import (
    Conditioner,
    broadcast_cond,
    concat_timestep_embed,
)


def _batch(b=2, hw=32):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, hw, hw, 3) * 2 - 1, jnp.float32)
    return {
        "cond_frames_without_noise": img,
        "cond_frames": img + 0.02 * jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32),
        "fps_id": jnp.full((b,), 6.0),
        "motion_bucket_id": jnp.full((b,), 127.0),
        "cond_aug": jnp.full((b,), 0.02),
    }


def _cond_module():
    cfg = ConditionerConfig(clip_embed_dim=16, vector_outdim=8, use_clip=True)
    vae_cfg = VAEConfig.tiny()
    clip_cfg = CLIPVisionConfig.tiny()
    return Conditioner(cfg, vae_cfg, clip_cfg), cfg


def test_clip_tower_shapes():
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    params = tower.init(jax.random.PRNGKey(0), x)
    pooled, tokens = tower.apply(params, x)
    grid = cfg.image_size // cfg.patch_size
    assert pooled.shape == (2, cfg.output_dim)
    assert tokens.shape == (2, grid * grid, cfg.width)


def test_clip_preprocess_range():
    x = jnp.ones((1, 64, 64, 3))  # +1 -> pixel value 1.0 -> (1-mean)/std
    out = clip_preprocess(x, 28)
    expected = (1.0 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-5)


def test_concat_timestep_embed_shape():
    emb = concat_timestep_embed(jnp.asarray([6.0, 127.0]), 8)
    assert emb.shape == (2, 8)
    emb2 = concat_timestep_embed(jnp.asarray([[6.0, 1.0]]), 8)
    assert emb2.shape == (1, 16)


@pytest.mark.slow
def test_conditioner_outputs_and_uc():
    mod, cfg = _cond_module()
    batch = _batch(hw=28)
    params = mod.init(jax.random.PRNGKey(0), batch)
    c, uc = mod.apply(params, batch, method=Conditioner.pair)
    assert c["crossattn"].shape == (2, 1, 16)
    assert c["vector"].shape == (2, 3 * 8)
    assert c["concat"].shape[0] == 2 and c["concat"].shape[-1] == 4
    # uc zeroes image-derived embeddings, keeps the vector
    np.testing.assert_array_equal(np.asarray(uc["crossattn"]), 0.0)
    np.testing.assert_array_equal(np.asarray(uc["concat"]), 0.0)
    np.testing.assert_array_equal(np.asarray(uc["vector"]), np.asarray(c["vector"]))
    assert not np.allclose(np.asarray(c["crossattn"]), 0.0)


def test_broadcast_cond():
    c = {
        "crossattn": jnp.ones((2, 1, 16)),
        "vector": jnp.ones((2, 24)),
        "concat": jnp.ones((2, 4, 4, 4)),
    }
    out = broadcast_cond(c, 5)
    assert out["crossattn"].shape == (2, 5, 1, 16)
    assert out["vector"].shape == (2, 5, 24)
    assert out["concat"].shape == (2, 5, 4, 4, 4)
