"""Config-tree invariants, incl. reference autoregression math
(inference_i2v.py:179-184,249)."""

from streamingt2v_tpu.config import PipelineConfig, VideoUNetConfig


def test_defaults_match_reference():
    cfg = PipelineConfig()
    assert cfg.unet.model_channels == 320
    assert cfg.unet.channel_mult == (1, 2, 4, 4)
    assert cfg.unet.in_channels == 8 and cfg.unet.out_channels == 4
    assert cfg.unet.context_dim == 1024 and cfg.unet.adm_in_channels == 768
    assert cfg.sampler.num_steps == 30 and cfg.sampler.sigma_max == 700.0
    assert cfg.sampler.guider.min_scale == 1.5 and cfg.sampler.guider.max_scale == 3.0
    assert cfg.vae.scale_factor == 0.18215
    assert cfg.inference.fps_id == 6 and cfg.inference.motion_bucket_id == 127
    assert cfg.inference.cond_aug == 0.02
    assert cfg.enhance.strength == 0.97 and cfg.enhance.seed == 8888


def test_autoregression_count():
    cfg = PipelineConfig(num_frames=200)
    # stage-1 target (200+1)//2 = 100; ceil((100-25)/18) = 5
    assert cfg.stage1_frames == 100
    assert cfg.n_autoregressions(cfg.stage1_frames) == 5


def test_tiny_configs_consistent():
    cfg = PipelineConfig.tiny()
    assert cfg.unet.model_channels % cfg.unet.num_head_channels == 0
    assert cfg.inference.num_conditional_frames < cfg.inference.chunk_frames


def test_unet_tiny_levels():
    t = VideoUNetConfig.tiny()
    assert t.num_levels == 2
