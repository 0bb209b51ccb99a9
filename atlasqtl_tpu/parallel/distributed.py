"""Multi-host (multi-process) execution entry points.

The reference is single-threaded (SURVEY §2.3); this framework's multi-host
story is the standard JAX SPMD recipe: every process calls
``initialize()`` once at startup, builds ONE global mesh over
``jax.devices()`` (which spans all processes after initialization), loads
the same data, and calls ``atlasqtl(..., mesh=mesh)``.  The compiled
program is identical on every process and XLA routes the cross-shard
collectives (the Z-row psums, the pipeline ppermutes) over ICI/DCN.

Host-side data placement is process-aware (parallel/mesh.py:_put):
under multi-process it uses ``jax.make_array_from_process_local_data``
with ``global_shape == local.shape`` — i.e. every process holds the full
host array (the natural contract at atlasqtl scale, where X/Y come from a
shared filesystem) and JAX slices out each device's addressable shard.
Result assembly gathers non-addressable shards back with
``process_allgather`` (mesh.py:to_host).

Testable bound of this environment: 2 localhost CPU processes with 4
virtual devices each (tests/test_multiprocess.py) — the placement and
collective code paths are identical to a real pod; only the transport
differs.
"""
from __future__ import annotations

import jax

__all__ = ["initialize", "is_initialized", "is_multiprocess"]


def is_initialized() -> bool:
    """True if jax.distributed has been initialized in this process."""
    from jax._src import distributed as _dist
    return _dist.global_state.coordinator_address is not None


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None, **kwargs) -> None:
    """Idempotent wrapper around ``jax.distributed.initialize``.

    Call once per process BEFORE any other JAX API touches the backend.
    All arguments are optional: on managed clusters (GKE/SLURM/Cloud TPU
    pods) JAX auto-detects them from the environment; on manual launches
    pass ``coordinator_address="host:port"``, ``num_processes`` and
    ``process_id`` explicitly.
    """
    if is_initialized():
        return
    opts = dict(coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id,
                local_device_ids=local_device_ids)
    opts = {k: v for k, v in opts.items() if v is not None}
    opts.update(kwargs)
    jax.distributed.initialize(**opts)


def is_multiprocess() -> bool:
    return jax.process_count() > 1
