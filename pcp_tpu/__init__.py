"""pcp_tpu — TPU-native large-scene 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
`92401/Based-on-point-cloud-partitions` VastGaussian-style pipeline:

- ``pcp_tpu.io``        COLMAP binary/text + PLY data layer (pure numpy).
- ``pcp_tpu.utils``     camera math, spherical harmonics, losses, schedules.
- ``pcp_tpu.partition`` vectorized point-count-balanced scene partitioner.
- ``pcp_tpu.models``    capacity-padded Gaussian pytree + appearance network.
- ``pcp_tpu.ops``       Pallas/XLA kernels: tile rasterizer, 3-NN scale init.
- ``pcp_tpu.train``     jitted train step + host loop (densify, checkpoints).
- ``pcp_tpu.parallel``  block-parallel fleet over a TPU mesh (shard_map).
- ``pcp_tpu.eval``      render + PSNR/SSIM/LPIPS metrics drivers.

See SURVEY.md for the structural map of the reference this framework mirrors.
"""

__version__ = "0.1.0"
