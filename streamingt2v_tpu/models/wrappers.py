"""Denoiser-facing model wrappers.

Functional rebuild of reference wrappers:
  - `OpenAIWrapper` (models/svd/sgm/modules/diffusionmodules/wrappers.py:22):
    concat c['concat'] to x channel-wise, call the UNet.
  - `StreamingWrapper` (models/diffusion/wrappers.py:7-78): additionally run
    the ControlNet on the first `num_frame_conditioning` frames (inputs
    sliced per-frame; context reduced to the first token; ctrl pixel frames
    CFG-doubled upstream by the guider) and feed its skips into the UNet's
    CAM mergers.

Each builder returns `network_fn(x, t_cont, cond) -> prediction` — the
function the Denoiser preconditioner wraps (diffusion/denoiser.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def openai_wrapper(unet_module, unet_params, mesh=None):
    """Plain SVD wrapper (first-chunk / non-streaming model).

    `mesh` (optional jax.sharding.Mesh) activates the logical sharding
    constraints placed at the UNet's layer boundaries."""
    from streamingt2v_tpu.parallel.sharding import active_mesh

    def network_fn(x: jax.Array, t_cont: jax.Array, cond: Dict[str, Any]) -> jax.Array:
        concat = cond.get("concat")
        if concat is not None:
            x = jnp.concatenate([x, concat.astype(x.dtype)], axis=-1)
        with active_mesh(mesh):
            return unet_module.apply(
                unet_params, x, t_cont,
                cond.get("crossattn"), cond.get("vector"),
            )

    return network_fn


def streaming_wrapper(
    unet_module,
    unet_params,
    controlnet_module,
    controlnet_params,
    num_frame_conditioning: int,
    mesh=None,
    ctrl_cfg_shared: bool = False,
):
    """StreamingSVD wrapper: ControlNet on conditional frames + CAM fusion.

    `ctrl_cfg_shared`: the CFG halves carry identical ctrl pixel frames
    (true for the inference pipeline — streaming.py sets the same tensor on
    c and uc), so the context-free conditioning embedder runs on one copy
    and is tiled inside the ControlNet."""
    from streamingt2v_tpu.parallel.sharding import active_mesh

    f_cond = num_frame_conditioning

    def network_fn(x: jax.Array, t_cont: jax.Array, cond: Dict[str, Any]) -> jax.Array:
        concat = cond.get("concat")
        if concat is not None:
            x = jnp.concatenate([x, concat.astype(x.dtype)], axis=-1)
        context = cond.get("crossattn")
        y = cond.get("vector")
        ctrl_frames = cond["ctrl_frames"]  # (B', F_cond, H*8, W*8, 3)
        if ctrl_cfg_shared and ctrl_frames.shape[0] > 1:
            ctrl_frames = ctrl_frames[:1]

        # ControlNet sees only the conditional frames; context stripped to
        # the first token (APM tokens removed, wrappers.py:39-40).
        with active_mesh(mesh):
            hs_control, h_control_mid = controlnet_module.apply(
                controlnet_params,
                x[:, :f_cond],
                t_cont,
                context[:, :f_cond, :1] if context is not None else None,
                y[:, :f_cond] if y is not None else None,
                ctrl_frames,
            )
            return unet_module.apply(
                unet_params, x, t_cont, context, y,
                hs_control=hs_control, h_control_mid=h_control_mid,
            )

    return network_fn
