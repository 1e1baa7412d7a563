"""Multi-host (multi-slice / DCN) runtime substrate.

The reference is strictly single-process, single-GPU (SURVEY.md §2.7;
reference config.yaml:6-7 `devices: 1`).  Scaling past one host on TPU
means multiple processes, each owning the chips of one host, joined by
`jax.distributed` — plus a device mesh laid out so that the slow
inter-slice DCN links only ever carry the `data` axis (gradient
all-reduce once per step), while `seq`/`model` collectives — which fire
inside every transformer layer — stay on intra-slice ICI.

Pieces:

  initialize()            — idempotent jax.distributed bring-up; a no-op
                            in single-process runs so every code path can
                            call it unconditionally.
  create_multihost_mesh() — hybrid DCN x ICI mesh: `data` is factored
                            into (dcn, ici) with the DCN factor outermost,
                            matching jax.experimental.mesh_utils'
                            hybrid-mesh device ordering.
  process_batch_slice()   — the per-process slice of a global batch for
                            data loading (each host feeds only the rows
                            that land on its own chips).
  global_batch_from_local() — assemble a jax.Array spanning all processes
                            from per-host shards (jax.make_array_from_
                            process_local_data).

Everything degrades exactly to the single-host behavior when
`jax.process_count() == 1`, so the entire test suite (virtual CPU mesh)
exercises the same code paths the multi-host deployment runs.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from streamingt2v_tpu.config import MeshConfig
from streamingt2v_tpu.parallel.mesh import AXIS_NAMES

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed once; safe to call from every entry point.

    Resolution order for each field: explicit argument, environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the
    names jax.distributed.initialize itself honors on non-TPU platforms;
    on Cloud TPU the runtime autodetects all three), else single-process
    no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        # A no-op (single-process) first call latches this flag; a later
        # call that passes explicit multi-process arguments would be
        # silently ignored — surface that instead.
        if coordinator_address is not None or num_processes is not None:
            import warnings

            warnings.warn(
                "multihost.initialize() called with explicit coordinator "
                "arguments after a previous initialize() already latched "
                "(possibly as a single-process no-op); the new arguments "
                "are ignored. Call initialize() with arguments first.",
                RuntimeWarning,
                stacklevel=2,
            )
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        # single-process run (tests, one-host inference): nothing to do.
        _INITIALIZED = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def _factor_dcn(data: int, num_granules: int) -> Tuple[int, int]:
    """Split the `data` axis into (dcn, ici) factors with dcn == the DCN
    granule count.  The full DCN dimension must live on `data`: putting
    `seq`/`model` across DCN would route per-layer collectives over the
    slow network."""
    if data % num_granules != 0:
        raise ValueError(
            f"data axis ({data}) must be a multiple of the DCN granule "
            f"count ({num_granules}) so only data-parallel gradient "
            f"reductions cross DCN"
        )
    return num_granules, data // num_granules


def create_multihost_mesh(
    cfg: Optional[MeshConfig] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    num_granules: Optional[int] = None,
) -> Mesh:
    """Build a (data, seq, model) mesh aware of the DCN topology.

    `num_granules` is the number of DCN-connected groups (TPU slices, or
    hosts on CPU/GPU).  Auto-detected from the device list's process ids
    when not given.  With one granule this is exactly
    `parallel.mesh.create_mesh`.

    Device order: granule-major (all of slice 0, then slice 1, ...) with
    the `data` axis outermost, so consecutive mesh rows along `data`
    change granule only at slice boundaries — the layout
    mesh_utils.create_hybrid_device_mesh produces, built here directly so
    the mesh keeps our fixed (data, seq, model) axis names and MeshConfig
    sizing.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_granules is None:
        n_proc = len({d.process_index for d in devices})
        num_granules = max(1, n_proc)
    if cfg is None:
        cfg = MeshConfig(data=len(devices), seq=1, model=1)
    if cfg.num_devices != len(devices):
        devices = devices[: cfg.num_devices]
        if cfg.num_devices > len(devices):
            raise ValueError(
                f"mesh {cfg} needs {cfg.num_devices} devices, have {len(devices)}"
            )
        # a sub-mesh can only keep whole granules
        sub_granules = len({d.process_index for d in devices})
        num_granules = max(1, sub_granules)

    dcn, ici_data = _factor_dcn(cfg.data, num_granules)
    per_granule = len(devices) // num_granules
    if per_granule * num_granules != len(devices):
        raise ValueError(
            f"{len(devices)} devices do not split evenly over "
            f"{num_granules} DCN granules"
        )
    # granule-major ordering: sort by (process_index, id) so each granule's
    # devices are contiguous, then shape (dcn, ici_data, seq, model) and
    # merge the two data factors.
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(dcn, ici_data, cfg.seq, cfg.model)
    arr = arr.reshape(cfg.data, cfg.seq, cfg.model)
    return Mesh(arr, AXIS_NAMES)


def process_batch_slice(mesh: Mesh, global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this process must feed.

    Data loading contract: the `data` mesh axis shards batch rows; each
    process materializes only the rows owned by its addressable devices
    (the reference's single-GPU loader has no equivalent — SURVEY.md §2.6).
    """
    sharding = NamedSharding(mesh, P(AXIS_NAMES[0]))
    # one (start, stop) per device; seq/model-replicated devices repeat the
    # same range — dedupe before checking contiguity
    ranges = {
        (idx[0].start or 0,
         idx[0].stop if idx[0].stop is not None else global_batch)
        for idx in sharding.addressable_devices_indices_map(
            (global_batch,)
        ).values()
    }
    starts = sorted(a for a, _ in ranges)
    stops = sorted(b for _, b in ranges)
    lo, hi = starts[0], stops[-1]
    # rows owned by one process are contiguous under granule-major layout
    assert hi - lo == sum(b - a for a, b in ranges), (
        "non-contiguous per-process batch rows; check mesh layout"
    )
    return slice(lo, hi)


def global_batch_from_local(mesh: Mesh, local_rows: np.ndarray, global_batch: int):
    """Assemble the global, data-sharded batch array from this process's
    rows (the output of feeding `process_batch_slice`)."""
    sharding = NamedSharding(mesh, P(AXIS_NAMES[0]))
    shape = (global_batch,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local_rows, shape)
