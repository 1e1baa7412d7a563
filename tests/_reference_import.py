"""Import the ACTUAL reference modules from /root/reference/code for
golden tests (VERDICT r2 item 3).

The reference depends on a handful of packages this environment lacks
(diffusers, pytorch_lightning, omegaconf, kornia, xformers).  Everything
the tested forwards actually COMPUTE with is implemented here with real
math (mirroring the pinned diffusers==0.27-era semantics the reference
requirements install); classes that are merely imported but not exercised
by the tested configurations raise on instantiation.

The reference tree itself is imported read-only and unmodified — these
goldens therefore pin our JAX modules against the reference's own forward
passes, superseding the hand-built replicas in test_composition_goldens.py
as the semantic net.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_CODE = "/root/reference/code"


# ---------------------------------------------------------------------------
# real-math diffusers stand-ins (only what the tested forwards execute)
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention — the subset of the
    constructor surface the reference uses (CAM conditioning.py:31-32,
    i2v_enhance attention.py), with the default AttnProcessor2_0 math:
    q/k/v linear -> head split -> SDPA -> to_out[0] linear -> dropout."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, upcast_attention=False,
                 out_bias=True, only_cross_attention=False, eps=1e-5,
                 processor=None, **kwargs):
        super().__init__()
        inner = heads * dim_head
        cross_attention_dim = cross_attention_dim or query_dim
        self.heads = heads
        self.upcast_attention = upcast_attention
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(inner, query_dim, bias=out_bias), nn.Dropout(dropout)]
        )

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kwargs):
        assert attention_mask is None
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        b, n, _ = hidden_states.shape
        m = ctx.shape[1]
        h = self.heads
        q = self.to_q(hidden_states).reshape(b, n, h, -1).permute(0, 2, 1, 3)
        k = self.to_k(ctx).reshape(b, m, h, -1).permute(0, 2, 1, 3)
        v = self.to_v(ctx).reshape(b, m, h, -1).permute(0, 2, 1, 3)
        if self.upcast_attention:
            q, k = q.float(), k.float()
        o = F.scaled_dot_product_attention(q, k, v.to(q.dtype))
        o = o.permute(0, 2, 1, 3).reshape(b, n, -1).to(hidden_states.dtype)
        return self.to_out[1](self.to_out[0](o))


class _Unused:
    """Placeholder for classes imported by reference modules but never
    instantiated under the tested configurations."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            f"{type(self).__name__} is a shim placeholder; the tested "
            "reference configuration should not instantiate it"
        )


def _unused(name):
    return type(name, (_Unused,), {})


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, x, *a):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


def get_activation(name):
    return {"silu": nn.SiLU(), "gelu": nn.GELU(), "relu": nn.ReLU(),
            "mish": nn.Mish()}[name]


class Timesteps(nn.Module):
    """diffusers sinusoidal embedding (flip_sin_to_cos=True,
    downscale_freq_shift=0 for the I2VGenXL config)."""

    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        import math

        half = self.num_channels // 2
        exponent = -math.log(10000) * torch.arange(
            half, dtype=torch.float32, device=timesteps.device
        )
        exponent = exponent / (half - self.downscale_freq_shift)
        emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                 out_dim=None, post_act_fn=None, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = get_activation(act_fn)
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)
        assert post_act_fn is None and cond_proj_dim is None

    def forward(self, sample, condition=None):
        return self.linear_2(self.act(self.linear_1(sample)))


class ResnetBlock2D(nn.Module):
    """diffusers.models.resnet.ResnetBlock2D — default template
    (norm-silu-conv ×2, time-emb add, optional 1x1 shortcut)."""

    def __init__(self, *, in_channels, out_channels=None, temb_channels=512,
                 groups=32, eps=1e-6, non_linearity="silu", dropout=0.0,
                 time_embedding_norm="default", output_scale_factor=1.0,
                 pre_norm=True, **kwargs):
        super().__init__()
        out_channels = out_channels or in_channels
        self.output_scale_factor = output_scale_factor
        self.time_embedding_norm = time_embedding_norm
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = get_activation(non_linearity)
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1)
            if in_channels != out_channels else None
        )

    def forward(self, x, temb):
        h = self.conv1(self.nonlinearity(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            h = h + self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
        h = self.conv2(self.dropout(self.nonlinearity(self.norm2(h))))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return (x + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None,
                 padding=1, name="op", **kwargs):
        super().__init__()
        out_channels = out_channels or channels
        assert use_conv
        conv = nn.Conv2d(channels, out_channels, 3, stride=2, padding=padding)
        self.name = name
        if name == "op":
            self.op = conv
        else:
            self.conv = conv

    def forward(self, x, *a, **k):
        return self.op(x) if self.name == "op" else self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None,
                 name="conv", **kwargs):
        super().__init__()
        out_channels = out_channels or channels
        assert use_conv
        self.conv = nn.Conv2d(channels, out_channels, 3, padding=1)

    def forward(self, x, output_size=None, *a, **k):
        x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        return self.conv(x)


class TemporalConvLayer(nn.Module):
    """diffusers.models.resnet.TemporalConvLayer (used by the I2VGenXL
    3D blocks): four (3,1,1) conv stacks with GN+SiLU, zero-init last,
    residual add on the (B, C, T, H, W) layout."""

    def __init__(self, in_dim, out_dim=None, dropout=0.0, norm_num_groups=32):
        super().__init__()
        out_dim = out_dim or in_dim
        self.in_dim = in_dim

        def block(i, o, zero=False):
            conv = nn.Conv3d(i, o, (3, 1, 1), padding=(1, 0, 0))
            if zero:
                nn.init.zeros_(conv.weight)
                nn.init.zeros_(conv.bias)
            return nn.Sequential(
                nn.GroupNorm(norm_num_groups, i), nn.SiLU(), conv
            )

        self.conv1 = block(in_dim, out_dim)
        self.conv2 = nn.Sequential(
            nn.GroupNorm(norm_num_groups, out_dim), nn.SiLU(),
            nn.Dropout(dropout), nn.Conv3d(out_dim, in_dim, (3, 1, 1), padding=(1, 0, 0))
        )
        self.conv3 = nn.Sequential(
            nn.GroupNorm(norm_num_groups, out_dim), nn.SiLU(),
            nn.Dropout(dropout), nn.Conv3d(out_dim, in_dim, (3, 1, 1), padding=(1, 0, 0))
        )
        self.conv4 = nn.Sequential(
            nn.GroupNorm(norm_num_groups, out_dim), nn.SiLU(),
            nn.Dropout(dropout), nn.Conv3d(out_dim, in_dim, (3, 1, 1), padding=(1, 0, 0))
        )
        nn.init.zeros_(self.conv4[-1].weight)
        nn.init.zeros_(self.conv4[-1].bias)

    def forward(self, hidden_states, num_frames=1):
        hidden_states = (
            hidden_states[None, :].reshape(-1, num_frames, *hidden_states.shape[1:])
            .permute(0, 2, 1, 3, 4)
        )
        identity = hidden_states
        hidden_states = self.conv1(hidden_states)
        hidden_states = self.conv2(hidden_states)
        hidden_states = self.conv3(hidden_states)
        hidden_states = self.conv4(hidden_states)
        hidden_states = identity + hidden_states
        hidden_states = hidden_states.permute(0, 2, 1, 3, 4).reshape(
            hidden_states.shape[0] * num_frames, hidden_states.shape[1],
            *hidden_states.shape[3:]
        )
        return hidden_states


class AlphaBlender(nn.Module):
    """diffusers.models.resnet.AlphaBlender ('learned_with_images')."""

    def __init__(self, alpha, merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        self.merge_strategy = merge_strategy
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix
        if merge_strategy == "fixed":
            self.register_buffer("mix_factor", torch.Tensor([alpha]))
        else:
            self.register_parameter(
                "mix_factor", nn.Parameter(torch.Tensor([alpha]))
            )

    def get_alpha(self, image_only_indicator, ndims):
        if self.merge_strategy == "fixed":
            alpha = self.mix_factor
        elif self.merge_strategy == "learned":
            alpha = torch.sigmoid(self.mix_factor)
        else:
            alpha = torch.where(
                image_only_indicator.bool(),
                torch.ones(1, 1, device=image_only_indicator.device),
                torch.sigmoid(self.mix_factor)[..., None],
            )
            if ndims == 5:
                alpha = alpha[:, None, :, None, None]
            else:
                alpha = alpha.reshape(-1)[:, None, None]
        return alpha

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        alpha = alpha.to(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


# config/modeling scaffolding -------------------------------------------------

def register_to_config(fn):
    import functools
    import inspect

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(fn)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        object.__setattr__(self, "_config", cfg)
        fn(self, *args, **kwargs)

    return wrapper


class _Config(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class ConfigMixin:
    @property
    def config(self):
        return _Config(getattr(self, "_config", {}))


class ModelMixin(nn.Module):
    @property
    def dtype(self):
        for p in self.parameters():
            return p.dtype
        return torch.float32


class BaseOutput(dict):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        for k, v in kwargs.items():
            setattr(self, k, v)


def _logging_getlogger(*a, **k):
    import logging

    return logging.getLogger("diffusers.shim")


def maybe_allow_in_graph(cls):
    return cls


def is_torch_version(op, version):
    return True  # torch here is newer than every reference check


def deprecate(*a, **k):
    return None


def apply_freeu(*a, **k):
    raise NotImplementedError("freeu is not exercised by the reference configs")


# ---------------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------------

def _mk(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_shims() -> None:
    """Install fake diffusers/pytorch_lightning/... modules into sys.modules
    (idempotent) and put /root/reference/code on sys.path."""
    if "diffusers" in sys.modules and hasattr(sys.modules["diffusers"], "_IS_SHIM"):
        return

    d = _mk("diffusers")
    d._IS_SHIM = True
    d_models = _mk("diffusers.models")
    ap = _mk("diffusers.models.attention_processor")
    ap.Attention = Attention
    ap.AttnProcessor = _unused("AttnProcessor")
    ap.AttnProcessor2_0 = _unused("AttnProcessor2_0")
    ap.JointAttnProcessor2_0 = _unused("JointAttnProcessor2_0")
    ap.AttentionProcessor = object
    ap.AttnAddedKVProcessor = _unused("AttnAddedKVProcessor")
    ap.AttnAddedKVProcessor2_0 = _unused("AttnAddedKVProcessor2_0")
    ap.FusedAttnProcessor2_0 = _unused("FusedAttnProcessor2_0")
    # processor-class tuples: only isinstance checks in set_attn_processor
    ap.ADDED_KV_ATTENTION_PROCESSORS = ()
    ap.CROSS_ATTENTION_PROCESSORS = ()

    acts = _mk("diffusers.models.activations")
    acts.GEGLU = GEGLU
    acts.GELU = GELU
    acts.ApproximateGELU = _unused("ApproximateGELU")
    acts.FP32SiLU = _unused("FP32SiLU")
    acts.SwiGLU = _unused("SwiGLU")
    acts.get_activation = get_activation

    emb = _mk("diffusers.models.embeddings")
    emb.TimestepEmbedding = TimestepEmbedding
    emb.Timesteps = Timesteps
    emb.SinusoidalPositionalEmbedding = _unused("SinusoidalPositionalEmbedding")
    emb.ImagePositionalEmbeddings = _unused("ImagePositionalEmbeddings")
    emb.PatchEmbed = _unused("PatchEmbed")
    emb.PixArtAlphaTextProjection = _unused("PixArtAlphaTextProjection")

    norm = _mk("diffusers.models.normalization")
    norm.AdaLayerNorm = _unused("AdaLayerNorm")
    norm.AdaLayerNormContinuous = _unused("AdaLayerNormContinuous")
    norm.AdaLayerNormZero = _unused("AdaLayerNormZero")
    norm.AdaLayerNormSingle = _unused("AdaLayerNormSingle")
    norm.RMSNorm = _unused("RMSNorm")

    resnet = _mk("diffusers.models.resnet")
    resnet.ResnetBlock2D = ResnetBlock2D
    resnet.Downsample2D = Downsample2D
    resnet.Upsample2D = Upsample2D
    resnet.TemporalConvLayer = TemporalConvLayer
    resnet.AlphaBlender = AlphaBlender
    resnet.SpatioTemporalResBlock = _unused("SpatioTemporalResBlock")

    unets = _mk("diffusers.models.unets")
    u3d = _mk("diffusers.models.unets.unet_3d_condition")
    u3d.UNet3DConditionOutput = BaseOutput
    umot = _mk("diffusers.models.unets.unet_motion_model")
    umot.CrossAttnDownBlockMotion = _unused("CrossAttnDownBlockMotion")
    umot.CrossAttnUpBlockMotion = _unused("CrossAttnUpBlockMotion")
    umot.DownBlockMotion = _unused("DownBlockMotion")
    umot.UNetMidBlockCrossAttnMotion = _unused("UNetMidBlockCrossAttnMotion")
    umot.UpBlockMotion = _unused("UpBlockMotion")

    mo = _mk("diffusers.models.modeling_outputs")
    mo.Transformer2DModelOutput = BaseOutput
    mu = _mk("diffusers.models.modeling_utils")
    mu.ModelMixin = ModelMixin
    mu.LegacyModelMixin = ModelMixin

    cu = _mk("diffusers.configuration_utils")
    cu.ConfigMixin = ConfigMixin
    cu.LegacyConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config

    loaders = _mk("diffusers.loaders")
    loaders.UNet2DConditionLoadersMixin = object
    lu = _mk("diffusers.loaders.unet")
    lu.UNet2DConditionLoadersMixin = object

    du = _mk("diffusers.utils")
    du.logging = types.SimpleNamespace(get_logger=_logging_getlogger)
    du.deprecate = deprecate
    du.is_torch_version = is_torch_version
    du.BaseOutput = BaseOutput
    du.USE_PEFT_BACKEND = False
    dtu = _mk("diffusers.utils.torch_utils")
    dtu.apply_freeu = apply_freeu
    dtu.maybe_allow_in_graph = maybe_allow_in_graph

    d.models = d_models
    d_models.attention_processor = ap
    d_models.resnet = resnet
    d_models.embeddings = emb

    # lightweight placeholders for the remaining missing packages
    if "pytorch_lightning" not in sys.modules:
        pl = _mk("pytorch_lightning")
        pl.LightningModule = nn.Module
        pl.LightningDataModule = object
        pl.Trainer = _unused("Trainer")
        plc = _mk("pytorch_lightning.callbacks")
        plc.Callback = object
        plu = _mk("pytorch_lightning.utilities")
        plu.rank_zero_only = lambda fn: fn
        plur = _mk("pytorch_lightning.utilities.rank_zero")
        plur.rank_zero_only = lambda fn: fn
        pll = _mk("pytorch_lightning.loggers")
        pll.Logger = object
    if "omegaconf" not in sys.modules:
        oc = _mk("omegaconf")
        oc.ListConfig = list
        oc.DictConfig = dict
        oc.OmegaConf = types.SimpleNamespace(
            create=lambda *a, **k: (a[0] if a else {}),
            to_container=lambda x, **k: x,
        )
    if "kornia" not in sys.modules:
        m = _mk("kornia")
        geo = _mk("kornia.geometry")
        tr = _mk("kornia.geometry.transform")
        tr.resize = _unused("kornia_resize")
        m.geometry = geo
        geo.transform = tr
        enh = _mk("kornia.enhance")
        enh.normalize = _unused("kornia_normalize")
        m.enhance = enh
    if "open_clip" not in sys.modules:
        ocl = _mk("open_clip")
        ocl.create_model_and_transforms = _unused("open_clip_create")
        ocl.create_model = _unused("open_clip_create_model")
        ocl.get_tokenizer = _unused("open_clip_tokenizer")
        ocl.tokenize = _unused("open_clip_tokenize")

    if REFERENCE_CODE not in sys.path:
        sys.path.insert(0, REFERENCE_CODE)
