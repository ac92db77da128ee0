"""Multi-host initialisation and mesh construction.

The reference has no distributed backend at all (SURVEY §2.4) — blocks are
dispatched as local subprocesses and hand off through the filesystem. Here
the fleet generalises to multi-host TPU pods:

- every host calls :func:`initialize` (jax.distributed handshake), then
  builds the global ("blocks",) mesh over all devices;
- block states are host-local shards of the same stacked pytree
  (jax.make_array_from_single_device_arrays), so dispatch rides ICI within
  a slice and DCN across slices without any code change in the step —
  block-parallel training has zero cross-device traffic in the hot loop,
  so even DCN-linked multi-slice fleets scale linearly;
- the merge step gathers block PLYs through the shared filesystem exactly
  like the reference, so its tooling interoperates.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). Returns True when a
    multi-process runtime was set up, False for single-host operation."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("PROCESS_ID", "0")),
    )
    return True


def global_block_mesh():
    """("blocks",) mesh over every device of every host."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ("blocks",))


def local_block_slice(n_blocks: int):
    """Which block indices this host owns under even contiguous sharding."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = (n_blocks + n_proc - 1) // n_proc
    return slice(pid * per, min((pid + 1) * per, n_blocks))
