"""Stage 3 — EMA-VFI 2x frame interpolation over a whole video.

Rebuild of reference `vfi_process` (i2v_enhance_interface.py:30-62):
keep the first video_len//2+1 frames, interpolate the midpoint of every
consecutive pair with flip-TTA, interleave, and duplicate the final frame
when the target length is even.  (The reference's BGR round-trip is an
internal no-op — frames go RGB->BGR into the model and back — so it is
intentionally omitted; note the model is color-channel-agnostic anyway.)

Pairs are interpolated in jitted batches rather than the reference's
one-pair-at-a-time Python loop (its stage-3 hot loop, SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.models.vfi import MultiScaleFlow, interpolate_pair


class InterpolatePipeline:
    def __init__(self, model: MultiScaleFlow, params, tta: bool = True,
                 pair_batch: int = 8, mesh=None):
        self.model = model
        self.params = params
        self.tta = tta
        self.pair_batch = pair_batch
        # multi-chip: frame pairs are independent — shard the pair batch
        # over the mesh 'data' axis (pairs don't interact; zero collectives)
        self.mesh = mesh

        def run(p, i0, i1):
            from streamingt2v_tpu.parallel.sharding import with_sharding

            axes = ("batch", None, None, None)
            i0 = with_sharding(i0, mesh, axes)
            i1 = with_sharding(i1, mesh, axes)
            out = interpolate_pair(self.model, p, i0, i1, tta=self.tta)
            return with_sharding(out, mesh, axes)

        self._run = jax.jit(run)

    # regenerable params — see streaming.py / utils/residency.py

    @property
    def _residency(self):
        from streamingt2v_tpu.utils.residency import FieldResidency

        r = getattr(self, "_residency_mgr", None)
        if r is None:
            r = self._residency_mgr = FieldResidency(("params",))
        return r

    def set_param_factory(self, thunk, produced_current: bool = True) -> None:
        """`thunk`: () -> params, regenerating the tree bitwise-identically."""
        self._residency.set_factory(
            {"params": thunk},
            {"params": self.params} if produced_current else None)

    def offload_params(self) -> None:
        """Params off HBM (TPU-native use_memopt, utils/residency.py):
        factory-produced trees are dropped, others copy to host RAM
        (cached per field)."""
        self.params = self._residency.offload({"params": self.params})["params"]

    def ensure_on_device(self) -> None:
        self.params = self._residency.restore({"params": self.params})["params"]

    def interpolate_video(self, video: jax.Array, target_len: Optional[int] = None) -> jax.Array:
        """video: (F, H, W, 3) in [0,1] -> (target_len, H, W, 3) in [0,1].

        target_len defaults to 2*F-1 (pure 2x minus one)."""
        self.ensure_on_device()
        f = video.shape[0]
        if target_len is not None:
            video = video[: target_len // 2 + 1]
            f = video.shape[0]
        i0 = video[:-1]
        i1 = video[1:]
        mids = []
        for s in range(0, f - 1, self.pair_batch):
            b0 = i0[s : s + self.pair_batch]
            b1 = i1[s : s + self.pair_batch]
            # pad the last batch to the compiled batch size
            pad = self.pair_batch - b0.shape[0]
            if pad and f - 1 > self.pair_batch:
                b0 = jnp.concatenate([b0, jnp.repeat(b0[-1:], pad, axis=0)], axis=0)
                b1 = jnp.concatenate([b1, jnp.repeat(b1[-1:], pad, axis=0)], axis=0)
                mids.append(self._run(self.params, b0, b1)[: self.pair_batch - pad])
            else:
                mids.append(self._run(self.params, b0, b1))
        mid = jnp.concatenate(mids, axis=0)
        out = jnp.stack([video[:-1], mid], axis=1).reshape((-1,) + video.shape[1:])
        out = jnp.concatenate([out, video[-1:]], axis=0)
        if target_len is not None:
            if target_len % 2 == 0:
                out = jnp.concatenate([out, video[-1:]], axis=0)
            out = out[:target_len]
        return out
