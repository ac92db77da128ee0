"""pcp_tpu.models — trainable scene representations.

- ``gaussians``  capacity-padded Gaussian-splat pytree + densify/prune
                 (replaces scene/gaussian_model.py's GaussianModel).
- ``appearance`` per-view appearance-decoupling CNN
                 (replaces scene/ptgs/appearance_network.py).
"""

from pcp_tpu.models.gaussians import (  # noqa: F401
    GaussianConfig,
    create_from_pcd,
    densify_and_prune,
    init_densify_stats,
    load_gaussians_ply,
    reset_opacity,
    save_gaussians_ply,
    scaling_act,
    opacity_act,
    rotation_act,
)
