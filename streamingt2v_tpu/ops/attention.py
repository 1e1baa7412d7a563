"""Attention dispatcher.

One entry point for every attention geometry in the pipeline (SURVEY.md
§2.8): spatial self-attention (9216 tokens at the 72x128 latent), temporal
attention (25 frames x huge batch), CLIP-token cross-attention (kv_len ~1),
CAM per-pixel cross-attention (F x 7), and the single-head 512-dim VAE
bottleneck attention.

Large geometries route to the Pallas flash kernel on TPU; small ones to a
plain XLA batched-matmul path (two MXU matmuls + fused softmax) which XLA
handles at speed-of-light without a custom kernel.  fp32 softmax always.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from streamingt2v_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_packed,
    packed_applicable,
)

# Below this many score-matrix elements per (batch*head), materializing
# the (Lq, Lk) scores is cheaper than a kernel launch.
_FLASH_MIN_SCORE_ELEMS = 2048 * 2048

# The XLA path writes + re-reads the full (B*H, Lq, Lk) f32 score tensor;
# above this many TOTAL score bytes the HBM traffic alone exceeds the
# flash kernel's cost even for rectangular geometries the per-row
# heuristic above keeps on XLA (stage-2 cross-attention: Lq=14400 x
# Lk=145 over 190 rows = 1.6 GB of scores per call).
_FLASH_MIN_SCORE_BYTES = 256 * 1024 * 1024


def _use_flash(bh: int, lq: int, lk: int) -> bool:
    if not _on_tpu():
        return False
    if lq * lk >= _FLASH_MIN_SCORE_ELEMS:
        return True
    # rectangular: huge q, small kv — flash still wins once the
    # materialized scores outweigh kernel overheads; lq must be large
    # enough to fill q blocks
    return lq >= 4096 and bh * lq * lk * 4 >= _FLASH_MIN_SCORE_BYTES

# Global override for experiments/benchmarks: "flash" | "xla" | "" (auto)
_FORCED_BACKEND = os.environ.get("STREAMINGT2V_ATTN_BACKEND", "")
# Global Pallas escape hatch (debug/bisection: routes attention, the
# GEGLU-FF, and the temporal conv to their XLA paths)
if os.environ.get("STREAMINGT2V_NO_PALLAS") == "1" and not _FORCED_BACKEND:
    _FORCED_BACKEND = "xla"

# Ring (blockwise-KV) attention for seq-sharded self-attention
# (parallel/ring_attention.py): KV shards rotate over the seq axis instead
# of being gathered / batch-redistributed.  DEFAULT on a multi-seq mesh —
# it keeps q/o token-sharded (no resharding), never materializes the
# full-length KV, and each hop overlaps with block compute; equivalence
# is pinned at production shard shapes (tests/test_parallel.py) and the
# comm evidence is in scripts/ring_comm.py + docs/PARALLEL.md.  Opt out
# with STREAMINGT2V_RING_ATTN=0 (falls back to the gather/batch-
# redistribution paths).


def _maybe_ring(qf, kf, vf, mesh):
    """Return ring-attention output or None if the path does not apply."""
    if mesh is None or os.environ.get("STREAMINGT2V_RING_ATTN", "1") == "0":
        return None
    from streamingt2v_tpu.parallel.ring_attention import (
        ring_attention, ring_attention_available,
    )

    bh, lq, _ = qf.shape
    if not ring_attention_available(mesh, bh, lq, kf.shape[1]):
        return None
    return ring_attention(qf, kf, vf, mesh)


def dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """Reference XLA attention. q: (..., Lq, D), k/v: (..., Lk, D)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("...qd,...kd->...qk", q, v.dtype.type(scale) * k.astype(v.dtype)).astype(
        jnp.float32
    )
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p.astype(v.dtype), v)


def _on_tpu() -> bool:
    # STREAMINGT2V_ASSUME_TPU=1: AOT compiles against a TPU topology from a
    # CPU host process (scripts/comm_budget.py) — the *target* is TPU even
    # though the default backend is not.
    return (jax.default_backend() == "tpu"
            or os.environ.get("STREAMINGT2V_ASSUME_TPU", "0") == "1")


NEG_INF_MASK = -1e30

# Tiny-L attention (temporal T=25, CAM T=25/kv=7): a batched matmul of
# (25, 64) @ (64, 25) pads both score dims to the 128-wide MXU tile and
# runs at <1 TFLOP/s effective (measured 15.8 ms for the level-0 temporal
# geometry).  Below this length, queries of G = 128 // Lq attention rows
# are PACKED into one tile with a block-diagonal mask — exp(-inf) = 0
# makes cross-row score entries contribute nothing, so the math is exact
# while the matmul becomes MXU-shaped (measured ~4x faster).
_GROUP_MAX_LEN = 64


def _grouped_tiny_attention(qf: jax.Array, kf: jax.Array, vf: jax.Array) -> jax.Array:
    """Exact attention for (B, Lq, D) with tiny Lq/Lk via tile packing.

    B folds batch*heads.  Rows i of tile-member g attend only keys of the
    same member: additive mask M[(g i), (g' j)] = 0 if g == g' else -inf.
    P @ V then sums masked (zero) terms for foreign keys — exact.
    """
    b, lq, d = qf.shape
    _, lk, _ = kf.shape
    g = max(1, 128 // max(lq, lk))
    pad = (-b) % g
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    n = qf.shape[0] // g
    qg = qf.reshape(n, g * lq, d)
    kg = kf.reshape(n, g * lk, d)
    vg = vf.reshape(n, g * lk, d)

    # block-diagonal additive mask, built once as a compile-time constant
    qi = jnp.arange(g * lq) // lq
    kj = jnp.arange(g * lk) // lk
    mask = jnp.where(qi[:, None] == kj[None, :], 0.0, NEG_INF_MASK)

    scale = d ** -0.5
    s = jnp.einsum(
        "nqd,nkd->nqk", qg, vg.dtype.type(scale) * kg.astype(vg.dtype)
    ).astype(jnp.float32)
    p = jax.nn.softmax(s + mask, axis=-1)
    o = jnp.einsum("nqk,nkd->nqd", p.astype(vg.dtype), vg)
    o = o.reshape(n * g, lq, d)
    return o[:b] if pad else o


def _flash_sharded(qf: jax.Array, kf: jax.Array, vf: jax.Array, mesh) -> jax.Array:
    """Run the Pallas flash kernel under `shard_map` over the folded
    (batch*heads) axis so GSPMD does not replicate the custom kernel:
    each device gets an independent slice of attention rows (attention is
    embarrassingly parallel over batch*heads).  The batch is zero-padded
    up to the device count — padded rows produce garbage that is sliced
    away."""
    from jax.experimental.shard_map import shard_map

    n = mesh.size
    b = qf.shape[0]
    pad = (-b) % n
    if pad:
        widths = ((0, pad), (0, 0), (0, 0))
        qf = jnp.pad(qf, widths)
        kf = jnp.pad(kf, widths)
        vf = jnp.pad(vf, widths)
    spec = P(mesh.axis_names)  # all mesh axes fold onto the batch dim
    out = shard_map(
        lambda q, k, v: flash_attention(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )(qf, kf, vf)
    return out[:b] if pad else out


def attention_pre_split(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    *,
    backend: Optional[str] = None,
) -> jax.Array:
    """Attention on pre-head-folded (B*H, L, D) tensors; returns the same
    layout.  For callers that can produce the folded layout in a single
    permutation (the temporal blocks fold (b t) s (h d) -> (b s h) t d in
    one transpose), this skips `attention`'s own head split/merge
    transposes — two full HBM passes per tensor at the level-0 geometry
    (docs/PERF.md)."""
    bh, lq, d = qf.shape
    _, lk, _ = kf.shape

    from streamingt2v_tpu.parallel.sharding import get_active_mesh, shard

    if backend is None and _FORCED_BACKEND:
        backend = _FORCED_BACKEND
    if backend is None:
        use_flash = _use_flash(bh, lq, lk)
    else:
        use_flash = backend == "flash"

    mesh = get_active_mesh()
    if use_flash:
        if mesh is not None and mesh.size > 1:
            o = _maybe_ring(qf, kf, vf, mesh)
            return o if o is not None else _flash_sharded(qf, kf, vf, mesh)
        return flash_attention(qf, kf, vf)
    # Dim 0 is the callers' (b·s·h) fold (batch, tokens, heads in
    # major-to-minor order — VideoTransformerBlock.to_time_split and
    # CAM) — shard it by ALL THREE mesh axes.  Labeling it `batch` alone
    # made GSPMD all-gather the seq-sharded tokens axis hidden in the
    # fold: ~7 GiB/step of f32 temporal KV on the DP2xSP4 mesh, the
    # dominant collective in the HLO budget (docs/PARALLEL.md).
    fold = ("batch", "tokens", "heads")
    if (lq <= _GROUP_MAX_LEN and lk <= _GROUP_MAX_LEN and bh >= 256
            and backend != "xla"):
        qf = shard(qf, fold, None, None)
        kf = shard(kf, fold, None, None)
        vf = shard(vf, fold, None, None)
        return _grouped_tiny_attention(qf, kf, vf)
    qf = shard(qf, fold, None, None)
    return dot_product_attention(qf, kf, vf)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int = 1,
    backend: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention over flat (B, L, H*D) tensors.

    Splits heads, dispatches to flash/XLA, and re-merges.  `backend` forces
    'flash' or 'xla'; default auto-selects by geometry and platform.
    """
    b, lq, hd = q.shape
    _, lk, _ = k.shape
    d = hd // num_heads
    assert num_heads * d == hd, (num_heads, hd)

    from streamingt2v_tpu.parallel.sharding import get_active_mesh, shard

    if backend is None and _FORCED_BACKEND:
        backend = _FORCED_BACKEND
    if backend is None:
        use_flash = _use_flash(b * num_heads, lq, lk)
    else:
        use_flash = backend == "flash"

    mesh = get_active_mesh()
    # Single-device flash: the head-packed kernel consumes (B, L, H*D)
    # directly (heads = static in-kernel lane slices), so the
    # (B,L,H*D) -> (B*H,L,D) fold/unfold transposes (4 HBM round-trips of
    # q/k/v/o per call; ~21 GB/step in the stage-1 copy budget,
    # docs/PERF.md round 5) never materialize.  Multi-device paths
    # (ring / shard_map) still take the folded 3D form.
    if (use_flash and (mesh is None or mesh.size <= 1)
            and packed_applicable(num_heads, d)
            and os.environ.get("STREAMINGT2V_FLASH_PACKED", "0") == "1"):
        return flash_attention_packed(q, k, v, num_heads=num_heads)

    qh = q.reshape(b, lq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, d).transpose(0, 2, 1, 3)

    if use_flash:
        qf = qh.reshape(b * num_heads, lq, d)
        kf = kh.reshape(b * num_heads, lk, d)
        vf = vh.reshape(b * num_heads, lk, d)
        if mesh is not None and mesh.size > 1:
            o = _maybe_ring(qf, kf, vf, mesh)
            if o is None:
                o = _flash_sharded(qf, kf, vf, mesh)
        else:
            o = flash_attention(qf, kf, vf)
        o = o.reshape(b, num_heads, lq, d)
    elif (
        lq <= _GROUP_MAX_LEN
        and lk <= _GROUP_MAX_LEN
        and b * num_heads >= 256
        and backend != "xla"
    ):
        qf = qh.reshape(b * num_heads, lq, d)
        kf = kh.reshape(b * num_heads, lk, d)
        vf = vh.reshape(b * num_heads, lk, d)
        # dim 0 folds (batch, heads) — shard by both mesh axes
        qf = shard(qf, ("batch", "heads"), None, None)
        kf = shard(kf, ("batch", "heads"), None, None)
        vf = shard(vf, ("batch", "heads"), None, None)
        o = _grouped_tiny_attention(qf, kf, vf).reshape(b, num_heads, lq, d)
    else:
        qh = shard(qh, "batch", "heads", "tokens", None)
        kh = shard(kh, "batch", "heads", None, None)
        vh = shard(vh, "batch", "heads", None, None)
        o = dot_product_attention(qh, kh, vh)
        o = shard(o, "batch", "heads", "tokens", None)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, hd)
