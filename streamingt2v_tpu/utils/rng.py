"""RNG discipline.

Reproduces the reference's seeding behavior with threaded JAX PRNG keys:
  - global seed 33 (config.yaml:2, `seed_everything`),
  - per-generation reset derived from the global seed
    (abstract_trainer.py:51-61,105-106),
  - fixed enhancement seed 8888 (i2v_enhance_interface.py:66),
  - randomized-blending offsets derived from a counter so chunk scheduling
    is bitwise-stable across runs (BASELINE.md north star).
"""

from __future__ import annotations

import jax


class RngStream:
    """A named, counter-addressed PRNG stream.

    `key(*tags)` is a pure function of (seed, name, tags) — no hidden
    state — so any draw is reproducible from its address.
    """

    def __init__(self, seed: int, name: str = ""):
        self.seed = int(seed)
        self.name = name
        base = jax.random.PRNGKey(self.seed)
        if name:
            base = jax.random.fold_in(base, _stable_hash(name))
        self._base = base

    def key(self, *tags: int) -> jax.Array:
        k = self._base
        for t in tags:
            k = jax.random.fold_in(k, int(t))
        return k

    def child(self, name: str) -> "RngStream":
        return RngStream(self.seed, f"{self.name}/{name}" if self.name else name)


def _stable_hash(s: str) -> int:
    """Deterministic 31-bit string hash (Python's hash() is salted)."""
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) & 0x7FFFFFFF
    return h


def generation_key(seed: int, generation_idx: int, reset_per_generation: bool = True) -> jax.Array:
    """Per-autoregressive-generation key.

    Mirrors the reference's `_reset_random_generator` re-seeding from
    PL_GLOBAL_SEED before each generation (abstract_trainer.py:51-61).
    """
    stream = RngStream(seed, "generation")
    return stream.key(generation_idx if reset_per_generation else 0)
