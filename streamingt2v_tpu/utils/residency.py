"""Stage-sequential HBM residency.

The TPU-native replacement for the reference's `use_memopt` CPU offload
(`inference_i2v.py:143-145`, block-swapped module execution): on a
single 16 GB chip the three stage model sets (stage-1 streaming pair +
SVD-XT + CLIP/VAE, the I2VGen-XL tower, EMA-VFI — ~14 GB in bf16
together) cannot stay co-resident with 720p activations.  But each
stage runs to completion before the next starts and the stage
boundaries are host-side uint8 videos, so whole param trees swap
between device HBM and host RAM at those boundaries instead.

Two residency mechanisms:

- **Host swap** (checkpoint-loaded weights): device -> host numpy copies,
  restored by a CHUNKED `jax.device_put` (`tree_on_device`).  On the
  tunneled platform this is expensive — measured ~8 MB/s up, ~12-23 MB/s
  down — but it is the only option for weights that exist nowhere else.
- **Regenerate** (random-weight product/bench runs): params are a pure
  function of the PRNG seed, so `offload` just DROPS the device
  references (frees HBM instantly, no download) and restore re-runs the
  jitted init programs on device (compile-cached; seconds).  Pipelines
  carry an optional `param_factory` for this; the PER-FIELD
  factory-identity check (`FieldResidency`) guarantees
  checkpoint-replaced trees never take the drop path, even when other
  fields of the same pipeline remain regenerable.
"""

from __future__ import annotations

import jax
import numpy as np


class _Dropped:
    """Sentinel standing in for a param tree whose device buffers were
    dropped (regenerable-params offload).  Truthy-false so accidental
    use fails loudly."""

    def __repr__(self) -> str:  # pragma: no cover
        return "<params dropped; regenerate via param_factory>"

    def __bool__(self) -> bool:
        return False


DROPPED = _Dropped()


def is_dropped(tree) -> bool:
    return tree is DROPPED


def tree_to_host(tree):
    """Device -> host copies of every array leaf (HBM freed once the old
    device references drop)."""
    return jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, tree
    )


# Upload group budget: one batched device_put per group.  Bounded well
# below the platform's largest allocatable contiguous block (~8 GiB
# observed on the 16 GB chip) so a whole-model restore can never fail on
# staging-arena exhaustion even with HBM nearly full.
_PUT_GROUP_BYTES = 256 * 2**20


def tree_on_device(tree):
    """Host -> default device, chunked: leaves are uploaded in groups of
    <= _PUT_GROUP_BYTES with a sync between groups.  A single batched
    `device_put` of a multi-GB tree can exhaust the transfer staging
    arena on the tunneled platform (observed: RESOURCE_EXHAUSTED on a
    ~9.5 GB stage-1 restore while HBM itself had room)."""
    leaves, treedef = jax.tree.flatten(tree)
    out: list = [None] * len(leaves)
    group: list[int] = []
    group_bytes = 0

    def flush():
        nonlocal group, group_bytes
        if not group:
            return
        put = jax.device_put([leaves[i] for i in group])
        for i, arr in zip(group, put):
            out[i] = arr
        jax.block_until_ready(put)
        group, group_bytes = [], 0

    for i, leaf in enumerate(leaves):
        nbytes = getattr(leaf, "nbytes", 0)
        if group and group_bytes + nbytes > _PUT_GROUP_BYTES:
            flush()
        group.append(i)
        group_bytes += nbytes
    flush()
    return jax.tree.unflatten(treedef, out)


def tree_is_on_host(tree) -> bool:
    """True if the tree's array leaves live in host RAM (numpy)."""
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            return False
        if isinstance(leaf, np.ndarray):
            return True
    return False


class FieldResidency:
    """Per-field residency manager shared by the pipelines.

    Tracks, for each named param field, whether the CURRENT tree was
    produced by a registered regenerating thunk (by object identity).
    `offload` then drops exactly the factory-produced fields (free) and
    host-swaps the rest (checkpoint-loaded weights); `restore` reverses
    both, per field — mixed states (some fields dropped, others on host)
    round-trip correctly.  Host copies are cached per field, keyed on the
    identity of the device tree they came from, so repeat offloads never
    re-download and replaced trees never restore stale bytes.
    """

    def __init__(self, fields):
        self.fields = tuple(fields)
        self.thunks: dict = {}        # field -> () -> tree
        self._factory_ids: dict = {}  # field -> id(tree) the thunk made
        self._host_cache: dict = {}   # field -> (src_id, host_tree)

    def set_factory(self, thunks: dict, current: dict | None) -> None:
        """Register regenerating thunks.  `current` maps field -> live
        tree for trees ALREADY produced by these thunks (so offload may
        drop them); pass None when current trees have other origins."""
        self.thunks = dict(thunks)
        self._factory_ids = ({f: id(current[f]) for f in thunks}
                             if current is not None else {})

    def clear_factory(self) -> None:
        """Checkpoint loaders call this: loaded weights exist nowhere
        else, so nothing may ever be dropped."""
        self.thunks = {}
        self._factory_ids = {}

    def regenerable(self, field: str, tree) -> bool:
        return (field in self.thunks
                and self._factory_ids.get(field) == id(tree))

    def offload(self, trees: dict) -> dict:
        """{field: tree} -> new mapping with every field off HBM."""
        out = {}
        for f, tree in trees.items():
            if tree is None or is_dropped(tree) or tree_is_on_host(tree):
                out[f] = tree
            elif self.regenerable(f, tree):
                out[f] = DROPPED
            else:
                cached = self._host_cache.get(f)
                if cached is None or cached[0] != id(tree):
                    cached = (id(tree), tree_to_host(tree))
                    self._host_cache[f] = cached
                out[f] = cached[1]
        return out

    def restore(self, trees: dict) -> dict:
        """{field: tree} -> new mapping with every field on device."""
        out = {}
        for f, tree in trees.items():
            if is_dropped(tree):
                new = self.thunks[f]()
                self._factory_ids[f] = id(new)
                out[f] = new
            elif tree is not None and tree_is_on_host(tree):
                new = tree_on_device(tree)
                # re-key the host cache to the restored tree so the next
                # offload reuses this copy without re-downloading; trees
                # that reach the host path never came from the factory
                # (regenerable ones are dropped instead), so any stale
                # factory claim on this field is cleared
                self._host_cache[f] = (id(new), tree)
                self._factory_ids.pop(f, None)
                out[f] = new
            else:
                out[f] = tree
        return out

    def drop(self, field: str, tree):
        """DROPPED if `tree` is regenerable, else the tree unchanged."""
        return DROPPED if self.regenerable(field, tree) else tree
