"""pcp_tpu.ops — TPU compute kernels (JAX/XLA/Pallas).

- ``knn``        Morton-sorted approximate 3-NN mean-squared distance
                 (replaces the reference's simple-knn CUDA extension).
- ``projection`` per-Gaussian preprocess: project, EWA cov2D, conic, radii,
                 SH -> RGB (replaces forward.cu preprocessCUDA).
- ``binning``    tile x depth key sort -> per-tile Gaussian lists
                 (replaces CUB radix-sort binning in rasterizer_impl.cu).
- ``rasterize``  tile-based alpha compositing forward/backward
                 (replaces diff-gaussian-rasterization renderCUDA).
"""

from pcp_tpu.ops.knn import mean_sq_dist_3nn  # noqa: F401
