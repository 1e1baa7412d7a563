"""Ring (blockwise-KV) attention over the `seq` mesh axis.

The sequence-parallel alternative to gathered attention for the spatial
self-attention (72x128 latent = 9216 tokens; SURVEY.md §2.7 blockwise-
attention headroom): queries, keys and values all stay token-sharded;
KV shards rotate around the seq ring via `ppermute` while each device
folds the incoming block into an online-softmax accumulator (same math
as the Pallas flash kernel, ops/flash_attention.py, in the exp2 domain).

vs the all-gather path: the wire VOLUME is identical ((n-1)/n of KV per
device either way), but the ring (a) never materializes the full-length
KV on any device — O(L/n) activation memory instead of O(L), (b) moves
bf16 blocks by construction (the gather path's collective can end up
riding an f32 upcast — docs/comm_budget), and (c) each hop overlaps with
the block's attention compute, where an all-gather serializes before the
first flop.  vs the `_flash_sharded` batch-redistribution path it also
avoids resharding q and the output entirely.

The reference is single-GPU and has no equivalent (SURVEY.md §2.7); the
design follows the blockwise/ring-attention literature (PAPERS.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from streamingt2v_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ

_LOG2E = 1.4426950408889634


def _ring_local(q, k, v, *, axis_name: str, n: int):
    """Per-device body (inside shard_map): q/k/v are LOCAL shards
    (B_loc, Lq_loc, D) / (B_loc, Lk_loc, D); returns (B_loc, Lq_loc, D).

    Self-attention only: every device's row set must be the same for its
    q and kv shards (true when q/k/v share one sharding spec)."""
    d = q.shape[-1]
    qs = (q.astype(jnp.float32) * (d ** -0.5 * _LOG2E)).astype(q.dtype)
    m = jnp.full(q.shape[:2], -jnp.inf, jnp.float32)          # (B, Lq)
    l = jnp.zeros(q.shape[:2], jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # unrolled: n is the mesh axis size (tiny); unrolling lets XLA overlap
    # each ppermute with the previous block's matmuls
    for j in range(n):
        s = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (B, Lq, Lk_loc), log2 domain
        m_new = jnp.maximum(m, s.max(-1))
        p = jnp.exp2(s - m_new[..., None])
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + p.sum(-1)
        acc = acc * alpha[..., None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        m = m_new
        if j < n - 1:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention_available(mesh: Optional[Mesh], bh: int, lq: int, lk: int) -> bool:
    """Ring path applies: active multi-seq mesh, self-attention geometry
    (lq == lk), and shapes divisible by the mesh axes."""
    if mesh is None or AXIS_SEQ not in mesh.shape:
        return False
    n = mesh.shape[AXIS_SEQ]
    rows = mesh.shape.get(AXIS_DATA, 1) * mesh.shape.get(AXIS_MODEL, 1)
    return (n > 1 and lq == lk and lq % n == 0 and bh % rows == 0)


def ring_attention(qf: jax.Array, kf: jax.Array, vf: jax.Array, mesh: Mesh) -> jax.Array:
    """Self-attention over (B*H, L, D) with L sharded on the seq axis and
    B*H sharded over (data, model).  Exact (same online-softmax math as
    flash); use `ring_attention_available` to gate."""
    n = mesh.shape[AXIS_SEQ]
    spec = P((AXIS_DATA, AXIS_MODEL), AXIS_SEQ, None)
    fn = shard_map(
        functools.partial(_ring_local, axis_name=AXIS_SEQ, n=n),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(qf, kf, vf)
