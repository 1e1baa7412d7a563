"""Stage-sequential HBM residency.

The TPU-native replacement for the reference's `use_memopt` CPU offload
(`inference_i2v.py:143-145`, block-swapped module execution): on a
single 16 GB chip the three stage model sets (stage-1 streaming pair +
SVD-XT + CLIP/VAE, the I2VGen-XL tower, EMA-VFI — ~14 GB in bf16
together) cannot stay co-resident with 720p activations.  But each
stage runs to completion before the next starts and the stage
boundaries are host-side uint8 videos, so whole param trees swap
between device HBM and host RAM at those boundaries instead.

On the tunneled platform each host read carries ~30 ms RTT, so an
offload of a ~700-leaf tree costs ~20 s — noise next to multi-minute
stage times.  Restore is a single `jax.device_put` of the tree.
"""

from __future__ import annotations

import jax
import numpy as np


def tree_to_host(tree):
    """Device -> host copies of every array leaf (HBM freed once the old
    device references drop)."""
    return jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, tree
    )


def tree_on_device(tree):
    """Host -> default device (one batched transfer)."""
    return jax.device_put(tree)


def tree_is_on_host(tree) -> bool:
    """True if the tree's array leaves live in host RAM (numpy)."""
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            return False
        if isinstance(leaf, np.ndarray):
            return True
    return False
