"""End-to-end tiny stage-1 pipeline: the CPU-runnable fast_dev_run
equivalent (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import PipelineConfig
from streamingt2v_tpu.pipeline.build import build_pipeline


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline():
    return build_pipeline(PipelineConfig.tiny(), seed=0)


def _image(cfg):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(cfg.height, cfg.width, 3) * 2 - 1, jnp.float32)


def test_image_to_video_end_to_end(pipeline):
    cfg = pipeline.cfg
    # target 11 frames: chunk 5 + 2 generations x (5-2 kept) = 11
    video = pipeline.image_to_video(_image(cfg), num_frames=11, seed=33)
    assert video.shape == (11, cfg.height, cfg.width, 3)
    v = np.asarray(video)
    assert np.all(np.isfinite(v))
    assert v.min() >= -1.0 and v.max() <= 1.0


def test_autoregression_count_matches_formula(pipeline):
    cfg = pipeline.cfg
    # chunk=5, cond=2 -> each generation adds 3 frames
    assert cfg.n_autoregressions(11) == 2
    assert cfg.n_autoregressions(5) == 0


def test_deterministic_given_seed(pipeline):
    cfg = pipeline.cfg
    v1 = pipeline.image_to_video(_image(cfg), num_frames=8, seed=7)
    v2 = pipeline.image_to_video(_image(cfg), num_frames=8, seed=7)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_seed_changes_output(pipeline):
    cfg = pipeline.cfg
    v1 = pipeline.image_to_video(_image(cfg), num_frames=5, seed=1)
    v2 = pipeline.image_to_video(_image(cfg), num_frames=5, seed=2)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_pipeline_on_mesh_matches_single_device(pipeline):
    """build_pipeline(mesh=...) with TP-sharded params produces the same
    video as the unsharded pipeline."""
    from streamingt2v_tpu.config import MeshConfig, PipelineConfig
    from streamingt2v_tpu.parallel.mesh import create_mesh
    from streamingt2v_tpu.pipeline.build import build_pipeline

    cfg = pipeline.cfg
    img = _image(cfg)
    ref = pipeline.image_to_video(img, num_frames=5, seed=3)
    mesh = create_mesh(MeshConfig(data=1, seq=1, model=2))
    sharded = build_pipeline(PipelineConfig.tiny(), seed=0, mesh=mesh)
    out = sharded.image_to_video(img, num_frames=5, seed=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_image_to_video_with_apm():
    """use_apm end-to-end: the conditioner emits 16+1 CLIP tokens from the
    so-far-video anchor frames, the UNet's APM mixer consumes them, and
    generation still produces the right frame count."""
    import dataclasses

    from streamingt2v_tpu.config import PipelineConfig
    from streamingt2v_tpu.pipeline.build import build_pipeline

    cfg = PipelineConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        unet=dataclasses.replace(cfg.unet, use_apm=True),
        inference=dataclasses.replace(cfg.inference, apm_anchor_frames=(0, 3)),
    )
    pipe = build_pipeline(cfg, seed=0)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(cfg.height, cfg.width, 3) * 2 - 1, jnp.float32)
    video = pipe.image_to_video(image, num_frames=8, seed=1)
    assert video.shape == (8, cfg.height, cfg.width, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_apm_no_retrace():
    """VERDICT r2 item 6: consecutive APM generations must reuse the same
    compiled _stream_chunk_fn executable — the APM anchor gather resolves
    frame indices on the host so every traced input keeps a static shape."""
    import dataclasses

    from streamingt2v_tpu.config import PipelineConfig
    from streamingt2v_tpu.pipeline.build import build_pipeline

    cfg = PipelineConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        unet=dataclasses.replace(cfg.unet, use_apm=True),
        inference=dataclasses.replace(cfg.inference, apm_anchor_frames=(0, 3)),
    )
    pipe = build_pipeline(cfg, seed=0)
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(cfg.height, cfg.width, 3) * 2 - 1, jnp.float32)
    # enough frames for >= 3 autoregressive generations
    chunk = cfg.inference.chunk_frames
    cond = cfg.inference.num_conditional_frames
    target = chunk + 3 * (chunk - cond)
    video = pipe.image_to_video(image, num_frames=target, seed=2)
    assert video.shape[0] == target
    sizes = pipe._stream_chunk_fn._cache_size()
    assert sizes == 1, f"_stream_chunk_fn retraced: {sizes} entries"


def test_vae_decode_bf16_close_to_f32(pipeline):
    """The stage-1 decode program runs bf16 by default (params cast
    in-program, f32 output).  Pin it against the f32 path: same z, error
    within 8-bit video quantization scale (the product's output domain).
    The f32 path stays reachable via InferenceParams.vae_decode_bf16."""
    import dataclasses

    from streamingt2v_tpu.pipeline.streaming import Stage1Pipeline

    assert pipeline.cfg.inference.vae_decode_bf16  # default ON
    m = pipeline.models
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 8, 8, 4),
                          jnp.float32) * 1.5
    out_bf = np.asarray(pipeline._decode_chunk_fn(m.vae_params, z))
    cfg32 = dataclasses.replace(
        pipeline.cfg, inference=dataclasses.replace(
            pipeline.cfg.inference, vae_decode_bf16=False))
    out_f32 = np.asarray(
        Stage1Pipeline(cfg32, m)._decode_chunk_fn(m.vae_params, z))
    assert out_bf.dtype == out_f32.dtype == np.float32
    assert np.all(np.isfinite(out_bf))
    # bf16 has ~2-3 significant decimal digits; outputs live in [-1, 1]
    # and are consumed as uint8 video (1/255 ~ 3.9e-3 per level)
    err = np.abs(out_bf - out_f32).max()
    assert err < 4e-2, err
