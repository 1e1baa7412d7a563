"""VideoUNet / ControlNet / CAM / wrapper tests on tiny configs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
from streamingt2v_tpu.models.cam import CAMConditionalModel
from streamingt2v_tpu.models.controlnet import ControlNet
from streamingt2v_tpu.models.unet_blocks import (
    SpatialVideoTransformer,
    UNetVideoResBlock,
    blend_with_images,
)
from streamingt2v_tpu.models.video_unet import VideoUNet
from streamingt2v_tpu.models.wrappers import openai_wrapper, streaming_wrapper

B, T, H, W = 1, 5, 8, 8
F_COND = 3


def _ucfg(controlnet_mode=True):
    return VideoUNetConfig.tiny(controlnet_mode=controlnet_mode)


def _inputs(cfg, t=T):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, t, H, W, cfg.in_channels), jnp.float32)
    t_cont = jnp.asarray(rng.randn(B), jnp.float32)
    ctx = jnp.asarray(rng.randn(B, t, 1, cfg.context_dim), jnp.float32)
    y = jnp.asarray(rng.randn(B, t, cfg.adm_in_channels), jnp.float32)
    return x, t_cont, ctx, y


@pytest.mark.slow
def test_unet_forward_shapes_no_control():
    cfg = _ucfg(controlnet_mode=False)
    unet = VideoUNet(cfg)
    x, t_cont, ctx, y = _inputs(cfg)
    params = unet.init(jax.random.PRNGKey(0), x, t_cont, ctx, y)
    out = unet.apply(params, x, t_cont, ctx, y)
    assert out.shape == (B, T, H, W, cfg.out_channels)
    # zero-init out conv -> exact zeros at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.mark.slow
def test_unet_temporal_mixing():
    """Perturbing frame 0 must change frame 4 output (temporal attention
    spans all frames)."""
    cfg = _ucfg(controlnet_mode=False)
    unet = VideoUNet(cfg)
    x, t_cont, ctx, y = _inputs(cfg)
    params = unet.init(jax.random.PRNGKey(0), x, t_cont, ctx, y)
    # randomize the zero-init projections so outputs are nonzero
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.RandomState(1).randn(*p.shape).astype(p.dtype), params
    )
    out1 = unet.apply(params, x, t_cont, ctx, y)
    out2 = unet.apply(params, x.at[0, 0].add(1.0), t_cont, ctx, y)
    assert not np.allclose(np.asarray(out1[0, 4]), np.asarray(out2[0, 4]))


@pytest.mark.slow
def test_controlnet_outputs():
    ucfg = _ucfg()
    ccfg = ControlNetConfig.tiny()
    cn = ControlNet(ucfg, ccfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, F_COND, H, W, ucfg.in_channels), jnp.float32)
    t_cont = jnp.zeros((B,))
    ctx = jnp.asarray(rng.randn(B, F_COND, 1, ucfg.context_dim), jnp.float32)
    y = jnp.asarray(rng.randn(B, F_COND, ucfg.adm_in_channels), jnp.float32)
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)
    pixels = jnp.asarray(rng.randn(B, F_COND, H * scale, W * scale, 3), jnp.float32)
    params = cn.init(jax.random.PRNGKey(0), x, t_cont, ctx, y, pixels)
    hs, mid = cn.apply(params, x, t_cont, ctx, y, pixels)
    # input blocks: conv_in + 2 levels x 1 res + 1 downsample = 4 skips
    assert len(hs) == 4
    assert hs[0].shape == (B, F_COND, H, W, ucfg.model_channels)
    assert hs[-1].shape == (B, F_COND, H // 2, W // 2, 2 * ucfg.model_channels)
    assert mid.shape == (B, F_COND, H // 2, W // 2, 2 * ucfg.model_channels)


def test_cam_zero_init_identity():
    cam = CAMConditionalModel(attention_head_dim=8)
    rng = np.random.RandomState(0)
    sample = jnp.asarray(rng.randn(B, T, 4, 4, 16), jnp.float32)
    cond = jnp.asarray(rng.randn(B, F_COND, 4, 4, 16), jnp.float32)
    params = cam.init(jax.random.PRNGKey(0), sample, cond)
    out = cam.apply(params, sample, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sample), atol=1e-6)


def test_cam_conditioning_changes_output():
    cam = CAMConditionalModel(attention_head_dim=8)
    rng = np.random.RandomState(0)
    sample = jnp.asarray(rng.randn(B, T, 4, 4, 16), jnp.float32)
    cond = jnp.asarray(rng.randn(B, F_COND, 4, 4, 16), jnp.float32)
    params = cam.init(jax.random.PRNGKey(0), sample, cond)
    params = jax.tree.map(
        lambda p: p + 0.05 * np.random.RandomState(1).randn(*p.shape).astype(p.dtype), params
    )
    out1 = cam.apply(params, sample, cond)
    out2 = cam.apply(params, sample, cond + 1.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_streaming_wrapper_end_to_end():
    """Full streaming network fn: ControlNet -> CAM-fused UNet, CFG batch."""
    ucfg = _ucfg(controlnet_mode=True)
    ccfg = ControlNetConfig.tiny()
    unet = VideoUNet(ucfg)
    cn = ControlNet(ucfg, ccfg)
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randn(2 * B, T, H, W, 4), jnp.float32)  # CFG-doubled
    t_cont = jnp.zeros((2 * B,))
    cond = {
        "concat": jnp.asarray(rng.randn(2 * B, T, H, W, 4), jnp.float32),
        "crossattn": jnp.asarray(rng.randn(2 * B, T, 1, ucfg.context_dim), jnp.float32),
        "vector": jnp.asarray(rng.randn(2 * B, T, ucfg.adm_in_channels), jnp.float32),
        "ctrl_frames": jnp.asarray(
            rng.randn(2 * B, F_COND,
                      H * 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1),
                      W * 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1), 3),
            jnp.float32),
    }
    xc = jnp.concatenate([x, cond["concat"]], axis=-1)
    unet_params = unet.init(jax.random.PRNGKey(0), xc, t_cont, cond["crossattn"], cond["vector"])
    cn_params = cn.init(
        jax.random.PRNGKey(1), xc[:, :F_COND], t_cont,
        cond["crossattn"][:, :F_COND, :1], cond["vector"][:, :F_COND], cond["ctrl_frames"],
    )
    net = streaming_wrapper(unet, unet_params, cn, cn_params, F_COND)
    out = net(x, t_cont, cond)
    assert out.shape == (2 * B, T, H, W, ucfg.out_channels)
    assert np.all(np.isfinite(np.asarray(out)))


def test_openai_wrapper_concat():
    ucfg = _ucfg(controlnet_mode=False)
    unet = VideoUNet(ucfg)
    x, t_cont, ctx, y = _inputs(ucfg)
    x4 = x[..., :4]
    cond = {"concat": x[..., 4:], "crossattn": ctx, "vector": y}
    params = unet.init(jax.random.PRNGKey(0), x, t_cont, ctx, y)
    net = openai_wrapper(unet, params)
    out = net(x4, t_cont, cond)
    assert out.shape == (B, T, H, W, ucfg.out_channels)


def test_blend_with_images_semantics():
    spatial = jnp.ones((1, 2, 3, 4))
    temporal = jnp.zeros((1, 2, 3, 4))
    mix = jnp.asarray([0.0])  # sigmoid -> 0.5
    ind = jnp.asarray([[True, False]])
    out = blend_with_images(mix, spatial, temporal, ind)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 1.0)   # image row: pure spatial
    np.testing.assert_allclose(np.asarray(out[0, 1]), 0.5)   # video row: sigmoid mix


def test_spatial_video_transformer_residual_at_init():
    """proj_out is zero-init -> the whole transformer is identity at init."""
    svt = SpatialVideoTransformer(heads=2, dim_head=8, context_dim=16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 3, 4, 4, 16), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 3, 2, 16), jnp.float32)
    ind = jnp.zeros((1, 3), bool)
    params = svt.init(jax.random.PRNGKey(0), x, ctx, ind)
    out = svt.apply(params, x, ctx, ind)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_unet_param_count_full_config():
    """Full SVD config must land in the expected ~1.5B range (SVD-XT UNet)."""
    cfg = VideoUNetConfig(controlnet_mode=False)
    unet = VideoUNet(cfg)
    x = jax.ShapeDtypeStruct((1, 2, 8, 8, cfg.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 2, 1, cfg.context_dim), jnp.float32)
    y = jax.ShapeDtypeStruct((1, 2, cfg.adm_in_channels), jnp.float32)
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), x, t, ctx, y)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 1.4e9 < n < 1.7e9, n / 1e9


@pytest.mark.slow
def test_use_checkpoint_remat_matches_forward_and_grad():
    """use_checkpoint=True (jax.checkpoint remat on res/attn blocks) must
    keep the param tree and outputs identical; gradients stay finite."""
    import dataclasses

    import numpy as np

    from streamingt2v_tpu.config import VideoUNetConfig
    from streamingt2v_tpu.models.video_unet import VideoUNet

    cfg = VideoUNetConfig.tiny(controlnet_mode=False)
    cfg_r = dataclasses.replace(cfg, use_checkpoint=True)
    unet, unet_r = VideoUNet(cfg), VideoUNet(cfg_r)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 8, 8, cfg.in_channels), jnp.float32)
    t = jnp.ones((1,))
    ctx = jnp.asarray(rng.randn(1, 2, 1, cfg.context_dim), jnp.float32)
    y = jnp.asarray(rng.randn(1, 2, cfg.adm_in_channels), jnp.float32)

    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, ctx, y)
    params_r = jax.jit(unet_r.init)(jax.random.PRNGKey(0), x, t, ctx, y)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_r)

    out = jax.jit(unet.apply)(params, x, t, ctx, y)
    out_r = jax.jit(unet_r.apply)(params, x, t, ctx, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5, rtol=1e-5)

    def loss(p):
        return jnp.mean(unet_r.apply(p, x, t, ctx, y) ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

@pytest.mark.slow
def test_streaming_wrapper_ctrl_cfg_shared_equivalence():
    """With identical ctrl frames on both CFG halves, ctrl_cfg_shared=True
    (one embedder pass, tiled) must match the unshared path exactly."""
    ucfg = _ucfg(controlnet_mode=True)
    ccfg = ControlNetConfig.tiny()
    unet = VideoUNet(ucfg)
    cn = ControlNet(ucfg, ccfg)
    rng = np.random.RandomState(0)
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)

    x = jnp.asarray(rng.randn(2, T, H, W, 4), jnp.float32)
    t_cont = jnp.zeros((2,))
    ctrl_one = jnp.asarray(rng.randn(1, F_COND, H * scale, W * scale, 3), jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.randn(2, T, H, W, 4), jnp.float32),
        "crossattn": jnp.asarray(rng.randn(2, T, 1, ucfg.context_dim), jnp.float32),
        "vector": jnp.asarray(rng.randn(2, T, ucfg.adm_in_channels), jnp.float32),
        "ctrl_frames": jnp.tile(ctrl_one, (2, 1, 1, 1, 1)),  # identical halves
    }
    xc = jnp.concatenate([x, cond["concat"]], axis=-1)
    up = unet.init(jax.random.PRNGKey(0), xc, t_cont, cond["crossattn"], cond["vector"])
    cp = cn.init(jax.random.PRNGKey(1), xc[:, :F_COND], t_cont,
                 cond["crossattn"][:, :F_COND, :1], cond["vector"][:, :F_COND],
                 cond["ctrl_frames"])

    ref = streaming_wrapper(unet, up, cn, cp, F_COND)(x, t_cont, cond)
    fast = streaming_wrapper(unet, up, cn, cp, F_COND, ctrl_cfg_shared=True)(
        x, t_cont, cond)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))
