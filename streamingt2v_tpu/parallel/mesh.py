"""Device mesh construction.

The reference is single-device (config.yaml:6-7; SURVEY.md §2.7) and scales
memory by CPU offload + chunked feed-forward.  Here the scaling substrate is
a `jax.sharding.Mesh` over ICI with three axes:

  data  — DP over the CFG (uncond‖cond) pair, autoregressive chunks, and
          blending chunks.
  seq   — SP over spatial tokens (the 72x128=9216-token latent attention).
  model — TP over attention heads and feed-forward hidden dims.

Multi-host (DCN) extension: axis order is (data, seq, model) so that `data`
maps to the outermost (slowest) ICI/DCN dimension.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from streamingt2v_tpu.config import MeshConfig

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_MODEL = "model"
AXIS_NAMES = (AXIS_DATA, AXIS_SEQ, AXIS_MODEL)


def mesh_shape_for(n_devices: int, prefer_model: int = 1) -> MeshConfig:
    """Pick a mesh shape for `n_devices` devices.

    Defaults put everything on `data` (the CFG pair and frame-batch give
    abundant batch parallelism in this workload); `prefer_model` carves out
    a TP axis when weight memory or latency demands it.
    """
    model = math.gcd(prefer_model, n_devices)
    rest = n_devices // model
    return MeshConfig(data=rest, seq=1, model=model)


def create_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = mesh_shape_for(len(devices))
    if cfg.num_devices > len(devices):
        raise ValueError(
            f"mesh {cfg} needs {cfg.num_devices} devices, have {len(devices)}"
        )
    devices = devices[: cfg.num_devices]
    arr = np.asarray(devices).reshape(cfg.data, cfg.seq, cfg.model)
    return Mesh(arr, AXIS_NAMES)


def local_mesh() -> Mesh:
    """A mesh over all locally visible devices, all on the data axis."""
    return create_mesh(mesh_shape_for(len(jax.devices())))
