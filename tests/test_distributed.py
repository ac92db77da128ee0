"""Multi-host helpers (parallel/distributed.py) under the virtual 8-CPU
mesh: mesh construction, block-slice arithmetic, and single-host fallback."""

import jax
import numpy as np

from pcp_tpu.parallel.distributed import (
    global_block_mesh,
    initialize,
    local_block_slice,
)


def test_global_block_mesh_covers_all_devices():
    mesh = global_block_mesh()
    assert mesh.axis_names == ("blocks",)
    assert mesh.devices.size == len(jax.devices()) == 8
    # the mesh is usable: shard an array over it
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(np.arange(16.0), NamedSharding(mesh, P("blocks")))
    assert float(x.sum()) == 120.0


def test_local_block_slice_partitions_evenly():
    # single-process runtime: this host owns everything
    assert jax.process_count() == 1
    sl = local_block_slice(10)
    assert (sl.start, sl.stop) == (0, 10)


def test_local_block_slice_arithmetic():
    """The contiguous even split covers [0, n) exactly once for any
    process count (pure arithmetic — simulate pids without a real pod)."""
    def slices(n_blocks, n_proc):
        per = (n_blocks + n_proc - 1) // n_proc
        return [
            (pid * per, min((pid + 1) * per, n_blocks))
            for pid in range(n_proc)
        ]

    for n_blocks in (1, 7, 8, 9, 16, 33):
        for n_proc in (1, 2, 4, 8):
            got = []
            for a, b in slices(n_blocks, n_proc):
                got.extend(range(a, max(a, b)))
            assert got == list(range(n_blocks)), (n_blocks, n_proc)


def test_initialize_falls_back_without_coordinator(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False
