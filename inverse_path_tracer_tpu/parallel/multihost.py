"""Multi-host SPMD initialization.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3).
Here multi-host runs use the standard JAX recipe: every host runs the
same program, jax.distributed.initialize() wires the processes, and the
existing shard_map programs (parallel/shard.py) transparently span all
hosts' devices — the 'rays' mesh axis covers the global device list, so
gradients/transport grids all-reduce over ICI within a slice and DCN
across hosts.  Failure recovery = job restart + checkpoint resume
(utils/checkpoint.py); renders are deterministic given keys, so resumed
runs are bit-reproducible.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if requested (explicitly or via the
    standard env vars); no-op for single-process runs.

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}."""
    import jax

    want_dist = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if want_dist:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
