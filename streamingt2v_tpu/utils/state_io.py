"""Param/state persistence (save + resume).

The reference is load-only (no training => no resume; SURVEY.md §5.4).
The training-capable engine here persists param/optimizer/EMA pytrees
with orbax, giving the checkpoint/resume subsystem the reference lacks.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_pytree(path: str, tree: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)
