"""The canonical benchmark scene: realistic trained-block density.

Round-1's bench cloud produced ~40 tile-intersections per Gaussian (3.97M
pairs at 100k live), several times denser than a trained real scene, and
silently overflowed both static caps — the measured iters/s dropped ~half
the compositing work (round-2 verdict, "bench honesty"). This scene is
built to the density statistics of converged 3DGS blocks instead:

- splat size is set in PIXELS (lognormal, median ~4 px sigma, tail to
  ~20 px) and converted to world units per point depth — matching how
  trained scenes look after densify/prune rather than raw kNN init;
- opacity is uniform in [0.1, 0.8] (a converged mix; exercises early
  termination the way real scenes do);
- the result is ~8 tiles/Gaussian mean (~0.8M pairs at 100k live,
  800x600), max tile load 456 < max_per_tile=512, and ZERO drops through
  binning v2's class tables — verified and reported by bench.py as
  `overflow`/`tile_saturated`.

max_per_tile sizes the kernel's K axis, and the composite cost tracks K
even when chunks past the real load are compute-skipped — each dead
chunk still DMAs its att block (measured: K=1024 costs +19 ms/step over
K=512 at the same 456 max load). Keep K the smallest CH multiple with
headroom over the observed max tile load.
"""

from __future__ import annotations

import numpy as np

W, H = 800, 600
FX = FY = 700.0
CAPACITY = 1 << 17
N_POINTS = 100_000
MAX_PER_TILE = 512
SIGMA_PX_MEDIAN = 4.0
SIGMA_PX_LOGSTD = 0.6


def make_scene(rng=None, n_points: int = None, capacity: int = None):
    """Returns (params, alive) for models.gaussians plus the camera tuple.

    ``n_points``/``capacity`` scale the scene beyond the canonical 100k
    point (bench.py's scale sweep: 500k, 1M live). The pixel-space splat
    size shrinks as sqrt(100k/n) — a scene densified to n Gaussians at the
    same resolution carries proportionally smaller splats, which is what
    converged 3DGS blocks look like; coverage (tile pairs) stays bounded
    by the image, not by n.

    Import-light: jax-touching work stays inside so tools can parse args
    first."""
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G

    n_points = n_points or N_POINTS
    capacity = capacity or (
        CAPACITY if n_points == N_POINTS
        else 1 << max(17, int(np.ceil(np.log2(n_points * 1.31))))
    )
    sigma_med = SIGMA_PX_MEDIAN * float(np.sqrt(N_POINTS / n_points))

    rng = rng or np.random.default_rng(0)
    depth = rng.uniform(8.0, 60.0, n_points).astype(np.float32)
    # fill the frustum with ~20% spill outside (invisible, like real blocks)
    half_w = (W / 2 + 60) / FX * depth
    half_h = (H / 2 + 60) / FY * depth
    xyz = np.stack(
        [rng.uniform(-1, 1, n_points) * half_w,
         rng.uniform(-1, 1, n_points) * half_h,
         depth], -1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (n_points, 3)).astype(np.float32)

    gcfg = G.GaussianConfig(sh_degree=3, capacity=capacity)
    params, alive = G.create_from_pcd(xyz, rgb, gcfg)

    # override kNN-init scales with trained-like pixel-space sizes
    sigma_px = np.exp(
        rng.normal(np.log(sigma_med), SIGMA_PX_LOGSTD, n_points)
    ).astype(np.float32)
    sigma_world = sigma_px * depth / FX
    scaling = np.full((capacity, 3), -10.0, np.float32)
    scaling[:n_points] = np.log(sigma_world)[:, None] * np.ones(
        (1, 3), np.float32)
    # mild anisotropy like trained splats
    scaling[:n_points] += rng.uniform(-0.35, 0.35,
                                      (n_points, 3)).astype(np.float32)
    params = dict(params)
    params["scaling"] = jnp.asarray(scaling)

    # converged-like opacity mix (create_from_pcd inits all at 0.1)
    op = rng.uniform(0.1, 0.8, n_points).astype(np.float32)
    opacity = np.full((capacity, 1), -10.0, np.float32)
    opacity[:n_points, 0] = np.log(op / (1.0 - op))
    params["opacity"] = jnp.asarray(opacity)
    return params, alive


def camera():
    import jax.numpy as jnp

    from pcp_tpu.ops.projection import CameraIntrin

    viewmat = jnp.eye(4)
    intrin = CameraIntrin(
        fx=jnp.float32(FX), fy=jnp.float32(FY),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
    )
    return viewmat, intrin
