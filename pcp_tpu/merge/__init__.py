"""pcp_tpu.merge — cut trained blocks to their bisection cells and fuse into
one scene PLY (scene/ptgs/{merge_partitions,cut_partition}.py and the
scene/sever_code/ toolbox)."""

from pcp_tpu.merge.merge import (  # noqa: F401
    cut_partition,
    dynamic_bounding_box,
    merge_ply_files,
    seamless_merge,
    split_gaussians_by_x_midpoint,
)
