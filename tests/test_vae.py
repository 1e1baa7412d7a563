"""VAE structure/shape tests + numerical properties on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.config import VAEConfig
from streamingt2v_tpu.models.vae import (
    AE3DConv,
    AutoencoderKL,
    Encoder,
    TemporalResStack,
    VideoDecoder,
    VideoResBlock,
)


def _tiny():
    return VAEConfig.tiny()  # ch=16, mult (1,2) -> downsample factor 2^(2-1)=2


def test_encoder_shapes():
    cfg = _tiny()
    enc = Encoder(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    # one downsample (2 levels), double_z -> 8 channels
    assert out.shape == (2, 8, 8, 2 * cfg.z_channels)


def test_video_decoder_shapes():
    cfg = _tiny()
    dec = VideoDecoder(cfg)
    z = jnp.zeros((1, 3, 8, 8, cfg.z_channels))
    params = dec.init(jax.random.PRNGKey(0), z)
    out = dec.apply(params, z)
    assert out.shape == (1, 3, 16, 16, 3)


def test_roundtrip_engine():
    cfg = _tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 16, 16, 3), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x)
    rec = vae.apply(params, x)
    assert rec.shape == x.shape
    assert np.all(np.isfinite(np.asarray(rec)))


def test_encode_mode_vs_sample():
    cfg = _tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    z_mode = vae.apply(params, x, method=AutoencoderKL.encode)
    z_mode2 = vae.apply(params, x, method=AutoencoderKL.encode)
    np.testing.assert_array_equal(np.asarray(z_mode), np.asarray(z_mode2))
    z_sample = vae.apply(params, x, jax.random.PRNGKey(5), method=AutoencoderKL.encode)
    assert not np.allclose(np.asarray(z_mode), np.asarray(z_sample))


def test_scale_factor_applied():
    cfg = _tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    mean, _ = vae.apply(params, x, method=AutoencoderKL.moments)
    np.testing.assert_allclose(np.asarray(z), cfg.scale_factor * np.asarray(mean), rtol=1e-6)


def test_video_resblock_zero_init_is_spatial_passthrough():
    """At init, mix_factor=0 -> alpha=0.5, and the temporal stack's output
    conv is zero-init so temporal==spatial -> blend == spatial output."""
    blk = VideoResBlock(out_channels=8)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 3, 4, 4, 8), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    # temporal residual stack is identity at init (zero out_conv)
    from streamingt2v_tpu.models.vae import ResnetBlock
    spatial_only = ResnetBlock(8).apply(
        {"params": params["params"]["spatial"]}, x.reshape(3, 4, 4, 8)
    ).reshape(1, 3, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(spatial_only), atol=1e-6)


def test_temporal_res_stack_identity_at_init():
    stack = TemporalResStack()
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 2, 2, 8), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(stack.apply(params, x)), np.asarray(x), atol=1e-6)


def test_ae3dconv_temporal_mixing():
    """The temporal conv must mix adjacent frames: perturbing frame 0 changes
    frame 1 output (kernel (3,1,1))."""
    conv = AE3DConv(out_channels=4)
    x = jnp.zeros((1, 4, 4, 4, 4))
    params = conv.init(jax.random.PRNGKey(1), x)
    x2 = x.at[0, 0].set(1.0)
    y1 = conv.apply(params, x)
    y2 = conv.apply(params, x2)
    assert not np.allclose(np.asarray(y1[0, 1]), np.asarray(y2[0, 1]))
    assert np.allclose(np.asarray(y1[0, 3]), np.asarray(y2[0, 3]))  # 2 frames away: untouched


def test_quant_conv_variant():
    cfg = VAEConfig.tiny()
    import dataclasses
    cfg = dataclasses.replace(cfg, temporal_decoder=False)
    vae = AutoencoderKL(cfg, use_quant_conv=True)
    x = jnp.zeros((2, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    assert "quant_conv" in params["params"] and "post_quant_conv" in params["params"]
    rec = vae.apply(params, x)
    assert rec.shape == x.shape
