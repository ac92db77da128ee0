"""pcp_tpu.cli — command-line drivers with the reference's flag surface.

    python -m pcp_tpu.cli.partition <sfm_path> [...]   (shen_partition_utils.py)
    python -m pcp_tpu.cli.train -s <src> -m <out>      (train.py)
    python -m pcp_tpu.cli.auto_train --base_path <dir> (auto_train.py; fleet)
    python -m pcp_tpu.cli.merge -m <model_path>        (merge_partitions.py)
    python -m pcp_tpu.cli.render -m <model_path>       (render.py)
    python -m pcp_tpu.cli.metrics -m <model_path>      (metrics.py)
"""
