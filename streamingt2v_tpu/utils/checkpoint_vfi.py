"""EMA-VFI checkpoint mapping (torch .pkl -> flax pytree).

Maps the reference's MultiScaleFlow state dict
(i2v_enhance/thirdparty/VFI/, keys under feature_bone./block./unet.)
onto streamingt2v_tpu.models.vfi.  Conventions:

  torch Sequential(conv, PReLU) pairs -> {name}/conv + {name}/prelu
  depthwise conv (groups=C): weight (C,1,3,3) -> (3,3,1,C) = t_conv2d
  ConvTranspose2d: weight (in,out,kh,kw) -> flax (kh,kw,in,out) with
  SPATIAL FLIP (torch transposed conv correlates with the mirrored
  kernel relative to lax.conv_transpose).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from streamingt2v_tpu.config import VFIConfig
from streamingt2v_tpu.utils.checkpoint import (
    MapDict,
    _conv,
    _linear,
    _norm,
    t_conv2d,
    t_id,
)


def t_deconv(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _conv_prelu(m: MapDict, fx: str, tk_conv: str, tk_prelu: str) -> None:
    _conv(m, f"{fx}/conv", tk_conv)
    m[f"{fx}/prelu"] = (f"{tk_prelu}.weight", t_id)


def vfi_map(cfg: VFIConfig, torch_prefix: str = "") -> MapDict:
    m: MapDict = {}
    p = f"{torch_prefix}." if torch_prefix else ""
    fb = f"{p}feature_bone"
    num_stages = len(cfg.embed_dims)
    conv_stages = num_stages - len(cfg.num_heads)

    for i in range(num_stages):
        fbx = f"feature_bone/block_{i}"
        if i < conv_stages:
            if i > 0:
                m[f"feature_bone/patch_embed_{i}_conv/kernel"] = (
                    f"{fb}.patch_embed{i+1}.0.weight", t_conv2d)
                m[f"feature_bone/patch_embed_{i}_conv/bias"] = (
                    f"{fb}.patch_embed{i+1}.0.bias", t_id)
                m[f"feature_bone/patch_embed_{i}_prelu"] = (
                    f"{fb}.patch_embed{i+1}.1.weight", t_id)
            for j in range(cfg.depths[i]):
                _conv_prelu(m, f"{fbx}/layer_{j}",
                            f"{fb}.block{i+1}.conv.{2*j}", f"{fb}.block{i+1}.conv.{2*j+1}")
        else:
            pe = f"{fb}.patch_embed{i+1}"
            pex = f"feature_bone/patch_embed_{i}"
            if i == conv_stages:
                n_layers = sum(2**k for k in range(conv_stages))
                for k in range(n_layers):
                    _conv(m, f"{pex}/layer_{k}", f"{pe}.layers.{k}")
                _conv(m, f"{pex}/proj", f"{pe}.proj")
            else:
                _conv(m, f"{pex}/proj", f"{pe}.proj")
            _norm(m, f"{pex}/norm", f"{pe}.norm")
            for j in range(cfg.depths[i]):
                bx = f"feature_bone/block_{i}_{j}"
                bt = f"{fb}.block{i+1}.{j}"
                _norm(m, f"{bx}/norm1", f"{bt}.norm1")
                _norm(m, f"{bx}/norm2", f"{bt}.norm2")
                _linear(m, f"{bx}/attn/q", f"{bt}.attn.q")
                _linear(m, f"{bx}/attn/kv", f"{bt}.attn.kv")
                _linear(m, f"{bx}/attn/cor_embed", f"{bt}.attn.cor_embed")
                _linear(m, f"{bx}/attn/proj", f"{bt}.attn.proj")
                _linear(m, f"{bx}/attn/motion_proj", f"{bt}.attn.motion_proj")
                _linear(m, f"{bx}/mlp_fc1", f"{bt}.mlp.fc1")
                _conv(m, f"{bx}/mlp_dwconv", f"{bt}.mlp.dwconv.dwconv")
                _linear(m, f"{bx}/mlp_fc2", f"{bt}.mlp.fc2")
            _norm(m, f"feature_bone/norm_{i}", f"{fb}.norm{i+1}")

    # flow heads (reference self.block.{i})
    for i in range(len(cfg.hidden_dims)):
        for j in range(3):
            _conv_prelu(m, f"head_{i}/conv_{j}",
                        f"{p}block.{i}.conv.{j}.0", f"{p}block.{i}.conv.{j}.1")

    # refine unet
    for k in range(4):
        _conv_prelu(m, f"unet/down{k}_0",
                    f"{p}unet.down{k}.conv1.0", f"{p}unet.down{k}.conv1.1")
        _conv_prelu(m, f"unet/down{k}_1",
                    f"{p}unet.down{k}.conv2.0", f"{p}unet.down{k}.conv2.1")
        m[f"unet/up{k}_deconv/kernel"] = (f"{p}unet.up{k}.0.weight", t_deconv)
        m[f"unet/up{k}_deconv/bias"] = (f"{p}unet.up{k}.0.bias", t_id)
        m[f"unet/up{k}_prelu"] = (f"{p}unet.up{k}.1.weight", t_id)
    _conv(m, "unet/conv", f"{p}unet.conv")
    return m
