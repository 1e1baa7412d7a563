"""Failure detection, retry and degradation policies.

The reference has almost no failure handling: `download_ckpt` (reference
utils/loader.py:18-52) retries nothing, OOM kills the run (its answer is
the static `use_memopt` flag, inference_i2v.py:143-145), and NaNs
propagate silently into the output video.  SURVEY.md §5.3 calls this out
as a gap to fill, not to mirror.  This module is the framework-wide
policy kit:

  retry()               — exponential-backoff retry for host-side IO
                          (checkpoint reads, media writes, remote fetch).
  fetch_file()          — atomic remote fetch (urllib; the only network
                          client in the repo) with resume-free retry and
                          optional sha256 verification.  Gated: only used
                          when a caller opts in, so zero-egress
                          environments never touch the network.
  is_oom() / with_oom_fallback() — detect XLA RESOURCE_EXHAUSTED and
                          degrade through a ladder of cheaper configs
                          (smaller decode chunks, remat on) instead of
                          dying.  TPU OOM surfaces at buffer-allocation
                          time of a jitted call, so the ladder re-enters
                          with a different static config (new trace).
  check_finite()        — host-side NaN/Inf audit of a pytree with
                          per-leaf reporting.
  nonfinite_guard()     — on-device training guard: zero the update and
                          flag the step when grads go non-finite (no host
                          sync; the flag is a device scalar the caller
                          can log asynchronously).
"""

from __future__ import annotations

import hashlib
import os
import time
import urllib.request
from typing import Any, Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class FetchError(RuntimeError):
    pass


def retry(
    fn: Callable[[], Any],
    *,
    attempts: int = 3,
    backoff: float = 0.5,
    retry_on: Tuple[type, ...] = (OSError,),
    on_retry: Optional[Callable[[int, BaseException], None]] = None,
):
    """Call `fn()` up to `attempts` times with exponential backoff.

    Backoff sleeps 0.5s, 1s, 2s, ... between attempts by default.  The
    last exception propagates unchanged so callers keep precise errors.
    """
    assert attempts >= 1
    for i in range(attempts):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203 — the loop IS the feature
            if i == attempts - 1:
                raise
            if on_retry is not None:
                on_retry(i + 1, e)
            time.sleep(backoff * (2**i))
    raise AssertionError("unreachable")


def fetch_file(
    url: str,
    dest: str,
    *,
    sha256: Optional[str] = None,
    attempts: int = 3,
    timeout: float = 60.0,
) -> str:
    """Download `url` to `dest` atomically (tmp file + rename), retrying
    transient failures.  Verifies sha256 when given.  Replaces reference
    `download_ckpt`'s gdown/wget calls (utils/loader.py:18-52) with a
    stdlib client that needs no extra dependency."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"

    def _get():
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r, \
                    open(tmp, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
        except urllib.error.HTTPError as e:
            # 4xx is permanent (bad URL / auth) — retrying with backoff
            # only delays the real error.  5xx stays retryable.
            if 400 <= e.code < 500:
                raise FetchError(
                    f"could not fetch {url} -> {dest}: HTTP {e.code} {e.reason}"
                    " (permanent client error, not retried)"
                ) from e
            raise

    try:
        retry(_get, attempts=attempts, retry_on=(OSError,))
    except OSError as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise FetchError(
            f"could not fetch {url} -> {dest}: {e}. If this environment has "
            f"no egress, download it out-of-band and place it at {dest}."
        ) from e
    if sha256 is not None:
        h = hashlib.sha256()
        with open(tmp, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != sha256:
            os.remove(tmp)
            raise FetchError(
                f"sha256 mismatch for {url}: got {h.hexdigest()}, want {sha256}"
            )
    os.replace(tmp, dest)
    return dest


# ---------------------------------------------------------------------------
# OOM degradation
# ---------------------------------------------------------------------------

def is_oom(exc: BaseException) -> bool:
    """True when `exc` is an XLA out-of-memory failure (any platform).

    On the tunneled TPU platform a compile-time HBM overflow surfaces as
    a generic INTERNAL remote_compile HTTP 500 (the "Ran out of memory in
    memory space hbm" detail stays in the compile helper's log), so that
    shape is treated as degradable too: a ladder rung that fails for a
    non-OOM compile reason fails identically on every rung and the final
    error still propagates."""
    import re

    msg = str(exc).upper()
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "OUT OF MEMORY" in msg
        or "RAN OUT OF MEMORY" in msg
        or ("REMOTE_COMPILE" in msg and "HTTP 500" in msg)
        or re.search(r"\bOOM\b", msg) is not None
    )


def drain_device_errors(attempts: int = 5, pause: float = 1.0) -> None:
    """Settle the device after an async failure: on TPU, a failed program's
    error can surface at a LATER dispatch, and its scratch buffers are
    reclaimed asynchronously.  Run a trivial computation with a host read
    (the only true synchronization point on tunneled platforms) until it
    succeeds, swallowing stale errors, so the next fallback candidate
    starts from a clean stream."""
    probe = jax.jit(lambda a: a.sum())
    for i in range(attempts):
        try:
            jax.device_get(probe(jnp.ones((8, 128), jnp.float32)))
            return
        except Exception:  # noqa: BLE001 — stale async errors, by design
            if i == attempts - 1:
                raise
            time.sleep(pause)


def with_oom_fallback(*candidates: Callable[[], Any], logger=None):
    """Run `candidates` in order; on OOM, fall through to the next (a
    cheaper configuration — smaller chunks, remat on, offload).  Non-OOM
    errors propagate immediately; the final candidate's OOM propagates.
    Between candidates the device stream is drained so one failure's
    async error cannot burn later rungs of the ladder."""
    assert candidates
    last: Optional[BaseException] = None
    for i, fn in enumerate(candidates):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by is_oom below
            if not is_oom(e) or i == len(candidates) - 1:
                raise
            last = e
            if logger is not None:
                logger(f"OOM on candidate {i} ({e!r:.120}); degrading")
            drain_device_errors()
    raise AssertionError("unreachable") from last


def decode_chunk_ladder(base: int, floor: int = 1) -> Sequence[int]:
    """Halving ladder of decode-chunk sizes: the degradation schedule for
    VAE decode OOM (e.g. 14 -> 7 -> 3 -> 1)."""
    out = []
    c = base
    while c >= floor:
        out.append(c)
        if c == floor:
            break
        c = max(floor, c // 2)
    return out


# ---------------------------------------------------------------------------
# Numerical-failure detection
# ---------------------------------------------------------------------------

class NonFiniteError(ValueError):
    def __init__(self, name: str, bad: Iterable[str]):
        self.bad_leaves = list(bad)
        super().__init__(
            f"non-finite values in {name}: {', '.join(self.bad_leaves[:8])}"
            + ("..." if len(self.bad_leaves) > 8 else "")
        )


def check_finite(tree, name: str = "tree") -> None:
    """Host-side audit: raise NonFiniteError naming every offending leaf.
    Synchronizes — use at stage boundaries / in tests, not per step."""
    import numpy as np

    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(np.isfinite(np.asarray(leaf)).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise NonFiniteError(name, bad)


def tree_all_finite(tree) -> jax.Array:
    """On-device scalar: True iff every floating leaf is finite.  Traceable
    (usable inside jit / scan)."""
    leaves = [
        jnp.isfinite(x).all()
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack(leaves).all()


def nonfinite_guard(updates, ok: Optional[jax.Array] = None):
    """Zero a (grad/param-update) pytree when it contains non-finite values.

    Returns (guarded_updates, ok): `ok` is a device bool scalar — False
    means the step was skipped.  All on-device; no host sync.  This is the
    train-step safety net the reference's Lightning loop lacks.
    """
    if ok is None:
        ok = tree_all_finite(updates)
    guarded = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
    return guarded, ok
