"""Multi-host (multi-slice) initialization scaffolding.

Single-host training needs none of this; on a multi-host TPU slice, call
:func:`initialize` once at process start (before any jax device access).
The mesh/sharding layer (parallel/mesh.py, parallel/sharding.py) is
topology-agnostic: ``jax.devices()`` then spans the whole slice, DP rides
DCN across hosts and TP stays inside each host's ICI domain when
``tp`` ≤ local device count.

Per-host data loading: each process feeds only its addressable shard of
the global batch (``host_batch_slice``), and
``jax.make_array_from_process_local_data`` assembles the global array.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection defaults."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this process's slice of a globally-sharded batch."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return i * per, per


def global_batch_from_host_data(local_array, mesh, pspec):
    """Assemble a global jax.Array from per-process local shards."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, pspec), local_array
    )
