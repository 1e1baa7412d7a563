"""Logical-axis sharding rules.

Activations and params carry *logical* axis names; `LOGICAL_RULES` maps them
onto mesh axes.  XLA inserts the collectives (all-gather / reduce-scatter /
psum) implied by the shardings — we never hand-write NCCL-style calls
(the reference has none either; SURVEY.md §2.7).

Logical axes used across the codebase:

  batch      — video/CFG batch            -> data
  frames     — temporal axis              -> (replicated; small: 25)
  tokens     — flattened spatial tokens   -> seq
  height     — spatial rows               -> seq (conv layouts)
  heads      — attention heads            -> model
  mlp        — FF hidden dim              -> model
  channels_out / embed — output features  -> model for TP'd weights
  channels / embed_in  — input features   -> replicated
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from streamingt2v_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ

LOGICAL_RULES: dict[str, Optional[str]] = {
    "batch": AXIS_DATA,
    "frames": None,
    "tokens": AXIS_SEQ,
    "height": AXIS_SEQ,
    "width": None,
    "heads": AXIS_MODEL,
    "mlp": AXIS_MODEL,
    "channels_out": AXIS_MODEL,
    "channels": None,
    "embed": None,
    "kernel": None,
    "time": None,
}


def spec_for(logical_axes: Tuple[Optional[str], ...]) -> P:
    return P(*(LOGICAL_RULES.get(a) if a is not None else None for a in logical_axes))


def logical_sharding(mesh: Mesh, logical_axes: Tuple[Optional[str], ...]) -> NamedSharding:
    return NamedSharding(mesh, spec_for(logical_axes))


def with_sharding(x, mesh: Optional[Mesh], logical_axes: Tuple[Optional[str], ...]):
    """Constrain `x` (inside jit) to the sharding implied by logical axes."""
    if mesh is None or mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(x, logical_sharding(mesh, logical_axes))


def _param_logical_axes(path: str, ndim: int) -> Tuple[Optional[str], ...]:
    """Infer logical axes for a parameter from its pytree path + rank.

    Conventions (flax linen): Dense kernels are (in, out); conv kernels are
    (*window, in, out).  We shard the output features of FF/projection
    weights onto the model axis; everything else is replicated.  Biases and
    norm scales are replicated.
    """
    if ndim == 0 or ndim == 1:
        return (None,) * ndim
    lowered = path.lower()
    tp_markers = ("ff", "mlp", "to_q", "to_k", "to_v", "qkv", "proj_in", "time_embed")
    if ndim == 2 and any(m in lowered for m in tp_markers):
        return ("channels", "channels_out")
    if ndim == 2:
        return ("channels", None)
    # conv kernels: replicate (UNet convs are small relative to activations)
    return (None,) * ndim


def shard_params(params, mesh: Optional[Mesh]):
    """Place a param pytree on `mesh` according to the logical rules."""
    if mesh is None or mesh.size == 1:
        return params

    def place(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        axes = _param_logical_axes(name, x.ndim)
        return jax.device_put(x, logical_sharding(mesh, axes))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_activations(x, mesh: Optional[Mesh], logical_axes: Tuple[Optional[str], ...]):
    return with_sharding(x, mesh, logical_axes)
