"""EMA-VFI tests: warp op goldens, window partition/reverse, pixel shuffle,
and the full tiny interpolation network."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import VFIConfig
from streamingt2v_tpu.models.vfi import (
    MotionFormer,
    MultiScaleFlow,
    interpolate_pair,
    pixel_shuffle,
    window_partition,
    window_reverse,
)
from streamingt2v_tpu.ops.warp import backward_warp


pytestmark = pytest.mark.slow


def test_backward_warp_zero_flow_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 5, 6, 3), jnp.float32)
    out = backward_warp(x, jnp.zeros((1, 5, 6, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_backward_warp_integer_shift():
    """flow (dx=1, dy=0) samples pixel (x+1): output col j = input col j+1."""
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8, 1)
    flow = jnp.concatenate([jnp.ones((1, 1, 8, 1)), jnp.zeros((1, 1, 8, 1))], axis=-1)
    out = backward_warp(x, flow)
    np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [1, 2, 3, 4, 5, 6, 7, 7])


def test_backward_warp_bilinear_half_pixel():
    x = jnp.asarray([[0.0, 2.0, 4.0]]).reshape(1, 1, 3, 1)
    flow = jnp.concatenate([jnp.full((1, 1, 3, 1), 0.5), jnp.zeros((1, 1, 3, 1))], -1)
    out = backward_warp(x, flow)
    np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [1.0, 3.0, 4.0], atol=1e-6)


def test_backward_warp_border_clamp():
    x = jnp.asarray([[1.0, 2.0]]).reshape(1, 1, 2, 1)
    flow = jnp.concatenate([jnp.full((1, 1, 2, 1), 10.0), jnp.zeros((1, 1, 2, 1))], -1)
    out = backward_warp(x, flow)
    np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [2.0, 2.0])


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5), jnp.float32)
    w = window_partition(x, (4, 4))
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, (4, 4), 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pixel_shuffle_matches_torch_semantics():
    import torch

    x = np.random.RandomState(0).rand(1, 8, 2, 3).astype(np.float32)  # NCHW, C=8
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    # channel-last input
    out = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.fixture(scope="module")
def vfi_model():
    cfg = VFIConfig.tiny()
    model = MultiScaleFlow(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)
    return model, params, cfg


def test_motionformer_pyramid_shapes():
    cfg = VFIConfig.tiny()
    mf = MotionFormer(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    params = mf.init(jax.random.PRNGKey(0), img, img)
    af, motion = mf.apply(params, img, img)
    assert len(af) == 5 and len(motion) == 5
    # pyramid scales /1 /2 /4 /8 /16
    assert [a.shape[1] for a in af] == [32, 16, 8, 4, 2]
    assert motion[0] is None and motion[3] is not None
    # motion features: motion_dim * depth channels
    assert motion[3].shape[-1] == cfg.motion_dims[3] * cfg.depths[3]


def test_vfi_interpolation_output(vfi_model):
    model, params, cfg = vfi_model
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    img1 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    pred = model.apply(params, img0, img1, 0.5)
    assert pred.shape == (1, 32, 32, 3)
    v = np.asarray(pred)
    assert np.all(np.isfinite(v)) and v.min() >= 0.0 and v.max() <= 1.0


def test_vfi_identical_frames_returns_same(vfi_model):
    """Interpolating a static pair should stay close to the input frame
    (flow ~ 0 at init, merge of two identical warps + small residual)."""
    model, params, cfg = vfi_model
    img = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    pred = model.apply(params, img, img, 0.5)
    assert pred.shape == img.shape


def test_vfi_tta_flip_consistency(vfi_model):
    model, params, cfg = vfi_model
    rng = np.random.RandomState(2)
    img0 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    img1 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    no_tta = interpolate_pair(model, params, img0, img1, tta=False)
    with_tta = interpolate_pair(model, params, img0, img1, tta=True)
    assert no_tta.shape == with_tta.shape == (1, 32, 32, 3)
    # TTA averages the plain prediction with the unflipped flipped-input
    # prediction: exactly reproducible and in range
    with_tta2 = interpolate_pair(model, params, img0, img1, tta=True)
    np.testing.assert_array_equal(np.asarray(with_tta), np.asarray(with_tta2))
    v = np.asarray(with_tta)
    assert v.min() >= 0.0 and v.max() <= 1.0
    # flip TTA == mean(pred, flip(pred(flip(inputs)))) computed manually
    flip = lambda x: x[:, ::-1, ::-1]
    manual = (
        model.apply(params, img0, img1, 0.5)
        + flip(model.apply(params, flip(img0), flip(img1), 0.5))
    ) / 2.0
    np.testing.assert_allclose(np.asarray(with_tta), np.asarray(manual), atol=1e-5)


def test_vfi_nondivisible_window_padding():
    """33x33 input is not divisible by the window size: center padding +
    masks must keep shapes correct."""
    cfg = VFIConfig.tiny()
    model = MultiScaleFlow(cfg)
    img = jnp.zeros((1, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)
    out = model.apply(params, img, img, 0.5)
    assert out.shape == (1, 32, 48, 3)


def test_interpolate_video_pipeline(vfi_model):
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline

    model, params, cfg = vfi_model
    video = jnp.asarray(np.random.RandomState(3).rand(5, 32, 32, 3), jnp.float32)
    pipe = InterpolatePipeline(model, params, tta=False, pair_batch=2)
    out = pipe.interpolate_video(video)
    # 5 frames -> 4 mids interleaved -> 9 frames
    assert out.shape == (9, 32, 32, 3)
    # originals preserved at even indices
    np.testing.assert_allclose(np.asarray(out[::2]), np.asarray(video), atol=1e-6)


def test_interpolate_video_dp_sharded_matches_single(vfi_model):
    """Pair batch sharded over a 4-device 'data' mesh == unsharded (frame
    pairs are independent; zero collectives)."""
    from streamingt2v_tpu.config import MeshConfig
    from streamingt2v_tpu.parallel.mesh import create_mesh
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline

    model, params, cfg = vfi_model
    video = jnp.asarray(np.random.RandomState(5).rand(5, 32, 32, 3), jnp.float32)
    base = InterpolatePipeline(model, params, tta=False, pair_batch=4)
    mesh = create_mesh(MeshConfig(data=4))
    dp = InterpolatePipeline(model, params, tta=False, pair_batch=4, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(dp.interpolate_video(video)),
        np.asarray(base.interpolate_video(video)), atol=1e-5, rtol=1e-5)


def test_interpolate_video_target_len_even(vfi_model):
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline

    model, params, cfg = vfi_model
    video = jnp.asarray(np.random.RandomState(4).rand(7, 32, 32, 3), jnp.float32)
    pipe = InterpolatePipeline(model, params, tta=False, pair_batch=4)
    # reference semantics: keep len//2+1 frames, duplicate last when even
    out = pipe.interpolate_video(video, target_len=8)
    assert out.shape == (8, 32, 32, 3)
    out = pipe.interpolate_video(video, target_len=7)
    assert out.shape == (7, 32, 32, 3)


def test_vfi_hr_and_multi_inference(vfi_model):
    from streamingt2v_tpu.models.vfi import MultiScaleFlow

    model, params, cfg = vfi_model
    rng = np.random.RandomState(5)
    img0 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    img1 = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    hr = model.apply(params, img0, img1, 0.5, 0.5, method=MultiScaleFlow.hr_forward)
    assert hr.shape == (1, 32, 32, 3)
    preds = model.apply(params, img0, img1, (0.25, 0.5, 0.75),
                        method=MultiScaleFlow.multi_forward)
    assert len(preds) == 3 and preds[0].shape == (1, 32, 32, 3)
    # multi at t=0.5 equals the plain forward (single backbone pass shared)
    plain = model.apply(params, img0, img1, 0.5)
    np.testing.assert_allclose(np.asarray(preds[1]), np.asarray(plain), atol=1e-5)
