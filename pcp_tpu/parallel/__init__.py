"""pcp_tpu.parallel — block-parallel training over a TPU device mesh.

The reference trains blocks as sequential subprocesses on one GPU
(auto_train.py:22-51, SURVEY §2.4). Block independence + fixed per-block
capacity (identical shapes) makes this embarrassingly SPMD: one
`shard_map` over a ("blocks",) Mesh trains every block simultaneously, one
block (or more) per chip. No gradient communication exists by construction —
the only collectives are for aggregate metrics.
"""

from pcp_tpu.parallel.fleet import (  # noqa: F401
    CameraBank,
    FleetState,
    build_camera_bank,
    make_fleet_step_banked,
    block_mesh,
    make_fleet_step,
    pad_blocks,
    stack_states,
    train_blocks_parallel,
    unstack_state,
)
