"""Video quality metrics.

MAWE (Motion-Aware Warp Error) — the quality metric the reference README
cites for StreamingT2V (README.md:90-91; defined in the paper): videos
should score low warp error *relative to* the amount of motion, penalizing
both flicker (high warp error) and stagnation (low motion).

    MAWE(V) = W(V) / (c * OFS(V))

where W is the mean squared backward-warp error between consecutive
frames under estimated optical flow, OFS is the mean flow magnitude, and
`c` calibrates the two scales (the paper uses c ~= 9.5).

The flow estimator is pluggable; `vfi_flow_fn` adapts this package's
EMA-VFI MotionFormer (timestep=1 flow of the img0 branch) so no external
flow network is needed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from streamingt2v_tpu.ops.warp import backward_warp

FlowFn = Callable[[jax.Array, jax.Array], jax.Array]  # (B,H,W,3)x2 -> (B,H,W,2)


def warp_error_and_ofs(video: jax.Array, flow_fn: FlowFn):
    """video: (F, H, W, 3) in [0,1] -> (mean warp MSE, mean |flow|)."""
    f0 = video[:-1]
    f1 = video[1:]
    flow = flow_fn(f0, f1)  # flow mapping frame t sampling positions into t+1
    warped = backward_warp(f1, flow)
    w = jnp.mean((warped - f0) ** 2)
    ofs = jnp.mean(jnp.sqrt(jnp.sum(flow**2, axis=-1) + 1e-12))
    return w, ofs


def mawe(video: jax.Array, flow_fn: FlowFn, c: float = 9.5) -> jax.Array:
    w, ofs = warp_error_and_ofs(video, flow_fn)
    return w / (c * jnp.maximum(ofs, 1e-6))


def mawe_chunked(video01_host, flow_fn: FlowFn, c: float = 9.5,
                 pairs_per_call: int = 8) -> float:
    """MAWE over a HOST-resident [0,1] float video of production length
    (e.g. 180x720p — the whole video and its flow batch would not fit
    HBM at once).  Frame pairs stream through the flow net in chunks;
    the pair-weighted means reproduce `mawe` on the full video."""
    import numpy as np

    f = int(video01_host.shape[0])
    w_sum = 0.0
    ofs_sum = 0.0
    n_pairs = 0
    for i in range(0, f - 1, pairs_per_call):
        n = min(pairs_per_call, f - 1 - i)
        f0 = jnp.asarray(video01_host[i:i + n], jnp.float32)
        f1 = jnp.asarray(video01_host[i + 1:i + 1 + n], jnp.float32)
        flow = flow_fn(f0, f1)
        from streamingt2v_tpu.ops.warp import backward_warp

        warped = backward_warp(f1, flow)
        w = float(jnp.mean((warped - f0) ** 2))
        ofs = float(jnp.mean(jnp.sqrt(jnp.sum(flow**2, axis=-1) + 1e-12)))
        w_sum += w * n
        ofs_sum += ofs * n
        n_pairs += n
    w_mean = w_sum / max(n_pairs, 1)
    ofs_mean = ofs_sum / max(n_pairs, 1)
    return float(w_mean / (c * max(ofs_mean, 1e-6)))


def vfi_flow_fn(model, params) -> FlowFn:
    """Adapt a MultiScaleFlow model: full-timestep flow of the first-frame
    branch as the t->t+1 optical flow estimate."""
    from streamingt2v_tpu.models.vfi import MultiScaleFlow

    def flow_fn(img0, img1):
        flow, _ = model.apply(params, img0, img1, 1.0,
                              method=MultiScaleFlow.calculate_flow)
        return flow[..., 0:2]

    return flow_fn
