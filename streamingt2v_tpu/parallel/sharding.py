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

import contextlib
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


# ---------------------------------------------------------------------------
# Active-mesh context: lets model code place with_sharding_constraint at
# layer boundaries without threading a Mesh through every module.  The
# context is consulted at *trace* time, so it must wrap the model `apply`
# call (wrappers/pipeline/train step do this); when no mesh is active (or
# the mesh is a single device), `shard()` is a no-op and single-chip code
# paths are untouched.
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Optional[Mesh] = None


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Make `mesh` the target of `shard()` constraints while tracing."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def shard(x, *logical_axes):
    """Constrain `x` to the active mesh along logical axes (no-op without
    an active multi-device mesh).  Dims whose logical axis size does not
    divide the mesh axis are left unconstrained rather than erroring.

    A TUPLE of logical names for one dim means that dim is a fold of
    several logical axes in major-to-minor order (e.g. the temporal
    attention batch (b·s·h) folds batch, tokens, heads) and is sharded by
    every corresponding mesh axis: without this, constraining the fold to
    `batch` alone forces GSPMD to ALL-GATHER the seq-sharded tokens axis
    hidden inside it — measured as the dominant collective (~7 GiB of
    f32 temporal-attention KV per step on the DP2xSP4 mesh,
    docs/PARALLEL.md)."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size == 1:
        return x
    axes = []
    for dim, name in enumerate(logical_axes):
        names = name if isinstance(name, tuple) else (name,)
        mesh_axes = tuple(
            m for n in names if n is not None
            if (m := LOGICAL_RULES.get(n)) is not None
        )
        total = 1
        for m in mesh_axes:
            total *= mesh.shape[m]
        if not mesh_axes or x.shape[dim] % total != 0:
            axes.append(None)
        elif len(mesh_axes) == 1:
            axes.append(mesh_axes[0])
        else:
            axes.append(mesh_axes)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*axes)))


# Megatron-style tensor parallelism over the transformer projections:
#   column-parallel (output features on `model`): q/k/v projections, the
#     GEGLU up-projection, the transformer's proj_in;
#   row-parallel (input features on `model`, XLA inserts the psum): the
#     attention output projection and the FF down-projection.
# Everything else (convs, norms, embeddings, biases) is replicated — UNet
# conv weights are small relative to activations.
_COL_PARALLEL_SEGMENTS = frozenset({"to_q", "to_k", "to_v", "qkv", "proj_in"})
_FF_SEGMENTS = frozenset({"ff", "ff_in"})


def _param_logical_axes(segments: Tuple[str, ...], ndim: int) -> Tuple[Optional[str], ...]:
    """Infer logical axes for a parameter from its exact pytree path
    segments + rank (flax: Dense kernels are (in, out))."""
    if ndim != 2:
        return (None,) * ndim
    segs = tuple(s.lower() for s in segments)
    parent = segs[-2] if len(segs) >= 2 else ""
    grandparent = segs[-3] if len(segs) >= 3 else ""
    leaf_module = parent  # .../<module>/kernel
    if leaf_module in _COL_PARALLEL_SEGMENTS:
        return ("channels", "channels_out")
    if leaf_module == "proj" and grandparent in _FF_SEGMENTS:
        return ("channels", "channels_out")
    if leaf_module == "to_out":
        return ("channels_out", "channels")
    if leaf_module == "out" and grandparent in _FF_SEGMENTS:
        return ("channels_out", "channels")
    return ("channels", None)


def param_sharding_tree(params, mesh: Mesh):
    """NamedSharding pytree for `params` (arrays OR ShapeDtypeStructs)
    according to the logical rules — usable as jit in_shardings for
    compile-only analysis without materializing the weights."""

    def spec(path, x):
        segments = tuple(str(getattr(k, "key", k)) for k in path)
        axes = _param_logical_axes(segments, x.ndim)
        # leave dims that don't divide the mesh axis unsharded
        fixed = []
        for dim, name in enumerate(axes):
            mesh_axis = LOGICAL_RULES.get(name) if name is not None else None
            if mesh_axis is not None and x.shape[dim] % mesh.shape[mesh_axis] != 0:
                name = None
            fixed.append(name)
        return logical_sharding(mesh, tuple(fixed))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Optional[Mesh]):
    """Place a param pytree on `mesh` according to the logical rules."""
    if mesh is None or mesh.size == 1:
        return params
    shardings = param_sharding_tree(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_activations(x, mesh: Optional[Mesh], logical_axes: Tuple[Optional[str], ...]):
    return with_sharding(x, mesh, logical_axes)
