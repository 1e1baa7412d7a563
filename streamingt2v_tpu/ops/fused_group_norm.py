"""Fused Pallas GroupNorm(+SiLU) for channel-last activations.

The profile of the VideoUNet forward shows GroupNorm's convert->reduce->
normalize chains as the second-largest cost after attention.  This kernel
runs two phases over L-blocks of each (L, C) row:

  phase 0: accumulate per-group sum / sum-of-squares into VMEM scratch
           (two small matmuls against a one-hot channel->group matrix)
  phase 1: revisit the same blocks, normalize + scale/bias + SiLU, write.

Each block is read twice and written once — the same HBM traffic as the
best XLA schedule — but the convert/reduce/normalize chain is one kernel
with no intermediate materialization, and blocks are sized to pipeline.

Used for per-frame GroupNorm (stats over H, W, C/G); the 5D temporal
variants keep the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, ghot_ref, scale_ref, bias_ref, o_ref, s1_scr, s2_scr, *,
            eps, act, elems_per_group, l_valid, block_l):
    p = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((p == 0) & (j == 0))
    def _reset():
        s1_scr[:] = jnp.zeros_like(s1_scr)
        s2_scr[:] = jnp.zeros_like(s2_scr)

    x = x_ref[0].astype(jnp.float32)  # (block_l, C)
    if l_valid % block_l != 0:
        # zero out padded rows so they don't pollute the statistics
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + j * block_l
        x = jnp.where(row < l_valid, x, 0.0)
    ghot = ghot_ref[:]  # (C, G)

    # HIGHEST precision: the MXU's DEFAULT f32 path truncates inputs to
    # bf16 (measured 1.7e-2 stat error on hardware, caught by
    # test_fused_group_norm_exact_on_real_tpu); with the one-hot group
    # matrix the HIGHEST products are exact selections.
    hi = jax.lax.Precision.HIGHEST

    @pl.when(p == 0)
    def _accumulate():
        s1_scr[:] += jnp.sum(
            jnp.dot(x, ghot, preferred_element_type=jnp.float32, precision=hi),
            axis=0, keepdims=True,
        )
        s2_scr[:] += jnp.sum(
            jnp.dot(x * x, ghot, preferred_element_type=jnp.float32, precision=hi),
            axis=0, keepdims=True,
        )

    @pl.when(p == 1)
    def _normalize():
        mean_g = s1_scr[:] / elems_per_group
        var_g = s2_scr[:] / elems_per_group - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, ghot.T, preferred_element_type=jnp.float32,
                         precision=hi)
        inv_c = jnp.dot(inv_g, ghot.T, preferred_element_type=jnp.float32,
                        precision=hi)
        out = (x - mean_c) * inv_c * scale_ref[:] + bias_ref[:]
        if act == "silu":
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.astype(o_ref.dtype)
    # phase 0 writes nothing: its out index_map pins block 0, so Mosaic
    # only flushes one placeholder block at the phase boundary instead of
    # writing every block twice (which doubled output HBM traffic).


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "act", "interpret"))
def fused_group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                     num_groups: int, eps: float = 1e-6, act: str = "none",
                     interpret: bool = False) -> jax.Array:
    """x: (N, L, C) with group stats over (L, C/G)."""
    n, l, c = x.shape
    assert c % num_groups == 0
    ghot = np.zeros((c, num_groups), np.float32)
    ghot[np.arange(c), np.arange(c) // (c // num_groups)] = 1.0
    elems = float(l * (c // num_groups))

    # L-blocks sized so in+out double buffering stays well under VMEM
    target = max(1, (1024 * 1024) // (c * max(x.dtype.itemsize, 2)))
    block_l = min(l, max(8, (target // 8) * 8))
    lp = -(-l // block_l) * block_l
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    nl = lp // block_l

    kernel = functools.partial(
        _kernel, eps=eps, act=act, elems_per_group=elems, l_valid=l, block_l=block_l
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, 2, nl),
        in_specs=[
            pl.BlockSpec((1, block_l, c), lambda i, p, j: (i, j, 0)),
            pl.BlockSpec((c, num_groups), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_l, c), lambda i, p, j: (i, j * p, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lp, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, num_groups), jnp.float32),
            pltpu.VMEM((1, num_groups), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, jnp.asarray(ghot), scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32))
    return out[:, :l]


# rows of any size are supported now; cap only extreme channel counts
def fits_fused(l: int, c: int, itemsize: int) -> bool:
    return c <= 4096
