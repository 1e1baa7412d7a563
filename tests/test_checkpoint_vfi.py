"""VFI checkpoint map: coverage + NUMERICAL equivalence of every layer
transform against real torch modules (torch-cpu available in tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import flax.linen as nn

from streamingt2v_tpu.config import VFIConfig
from streamingt2v_tpu.models.vfi import MultiScaleFlow
from streamingt2v_tpu.utils.checkpoint import coverage_report, t_conv2d, t_linear
from streamingt2v_tpu.utils.checkpoint_vfi import t_deconv, vfi_map


def test_vfi_mapping_full_coverage_tiny():
    cfg = VFIConfig.tiny()
    model = MultiScaleFlow(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)
    mapping = vfi_map(cfg)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [], f"params with no mapping: {unmapped[:10]}"
    assert extra == [], f"mapped but absent: {extra[:10]}"


def test_vfi_mapping_full_coverage_production():
    cfg = VFIConfig()
    model = MultiScaleFlow(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)
    mapping = vfi_map(cfg)
    unmapped, extra = coverage_report(mapping, params)
    assert unmapped == [] and extra == [], (unmapped[:5], extra[:5])


def _to_jnp(x):
    return jnp.asarray(x.detach().numpy())


def test_conv2d_transform_numerical():
    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(1, 3, 8, 8)
    ref = tconv(x).detach().numpy()
    fconv = nn.Conv(5, (3, 3))
    params = {"params": {"kernel": jnp.asarray(t_conv2d(tconv.weight.detach().numpy())),
                         "bias": _to_jnp(tconv.bias)}}
    out = fconv.apply(params, _to_jnp(x.permute(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_strided_conv_transform_numerical():
    torch.manual_seed(1)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    x = torch.randn(2, 4, 9, 9)
    ref = tconv(x).detach().numpy()
    fconv = nn.Conv(6, (3, 3), strides=(2, 2), padding=1)
    params = {"params": {"kernel": jnp.asarray(t_conv2d(tconv.weight.detach().numpy())),
                         "bias": _to_jnp(tconv.bias)}}
    out = fconv.apply(params, _to_jnp(x.permute(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_dilated_conv_transform_numerical():
    """CrossScalePatchEmbed convs: stride 4, padding 2, dilation 2."""
    torch.manual_seed(2)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=4, padding=2, dilation=2)
    x = torch.randn(1, 4, 16, 16)
    ref = tconv(x).detach().numpy()
    fconv = nn.Conv(6, (3, 3), strides=(4, 4), padding=2, kernel_dilation=(2, 2))
    params = {"params": {"kernel": jnp.asarray(t_conv2d(tconv.weight.detach().numpy())),
                         "bias": _to_jnp(tconv.bias)}}
    out = fconv.apply(params, _to_jnp(x.permute(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_depthwise_conv_transform_numerical():
    torch.manual_seed(3)
    tconv = torch.nn.Conv2d(6, 6, 3, padding=1, groups=6)
    x = torch.randn(1, 6, 8, 8)
    ref = tconv(x).detach().numpy()
    fconv = nn.Conv(6, (3, 3), feature_group_count=6)
    params = {"params": {"kernel": jnp.asarray(t_conv2d(tconv.weight.detach().numpy())),
                         "bias": _to_jnp(tconv.bias)}}
    out = fconv.apply(params, _to_jnp(x.permute(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_conv_transpose_transform_numerical():
    """torch ConvTranspose2d(k4, s2, p1) == flax ConvTranspose(SAME) with
    the t_deconv weight transform (spatial flip + axis swap)."""
    torch.manual_seed(4)
    tconv = torch.nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1)
    x = torch.randn(1, 4, 5, 7)
    ref = tconv(x).detach().numpy()
    fconv = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(t_deconv(tconv.weight.detach().numpy())),
                         "bias": _to_jnp(tconv.bias)}}
    out = fconv.apply(params, _to_jnp(x.permute(0, 2, 3, 1)))
    assert out.shape == (1, 10, 14, 6)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_linear_transform_numerical():
    torch.manual_seed(5)
    tlin = torch.nn.Linear(4, 7)
    x = torch.randn(3, 4)
    ref = tlin(x).detach().numpy()
    flin = nn.Dense(7)
    params = {"params": {"kernel": jnp.asarray(t_linear(tlin.weight.detach().numpy())),
                         "bias": _to_jnp(tlin.bias)}}
    np.testing.assert_allclose(np.asarray(flin.apply(params, _to_jnp(x))), ref, atol=1e-5)


def test_prelu_semantics_match_torch():
    torch.manual_seed(6)
    tp = torch.nn.PReLU(5)
    with torch.no_grad():
        tp.weight.copy_(torch.randn(5).abs() * 0.3)
    x = torch.randn(2, 5, 4, 4)
    ref = tp(x).detach().numpy()
    from streamingt2v_tpu.models.vfi import prelu

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return prelu(self, "p", x)

    m = M()
    params = {"params": {"p": _to_jnp(tp.weight)}}
    out = m.apply(params, _to_jnp(x.permute(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_group_norm_matches_torch():
    torch.manual_seed(7)
    tgn = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(torch.randn(16))
        tgn.bias.copy_(torch.randn(16))
    x = torch.randn(2, 16, 6, 6)
    ref = tgn(x).detach().numpy()
    from streamingt2v_tpu.ops import group_norm

    out = group_norm(
        _to_jnp(x.permute(0, 2, 3, 1)), _to_jnp(tgn.weight), _to_jnp(tgn.bias),
        num_groups=4, eps=1e-6,
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_temporal_group_norm_matches_torch_5d():
    """CAM/TransformerTemporal GroupNorm over (B, C, F, H, W)."""
    torch.manual_seed(8)
    tgn = torch.nn.GroupNorm(4, 8, eps=1e-6)
    x = torch.randn(2, 8, 3, 4, 4)
    ref = tgn(x).detach().numpy()
    from streamingt2v_tpu.ops import group_norm

    out = group_norm(
        _to_jnp(x.permute(0, 2, 3, 4, 1)), jnp.ones(8), jnp.zeros(8),
        num_groups=4, eps=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=1e-5
    )
