"""Real spherical harmonics evaluation for view-dependent color.

Parity with the reference's utils/sh_utils.py:57-118 (`eval_sh`, `RGB2SH`,
`SH2RGB`) using the same hard-coded real-SH constants, written in jnp so it is
jit/vmap/grad friendly and usable inside the rasterizer preprocess.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def rgb_to_sh(rgb):
    """RGB in [0,1] -> DC SH coefficient (sh_utils.py:114)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    """DC SH coefficient -> RGB (sh_utils.py:117)."""
    return sh * C0 + 0.5


def eval_sh(deg: int, sh, dirs):
    """Evaluate real SH up to degree 3 at unit directions.

    Args:
      deg: static int in [0, 3].
      sh: (..., K, 3) coefficients with K >= (deg+1)**2.
      dirs: (..., 3) unit view directions.

    Returns (..., 3) colors (pre-0.5-offset; caller adds 0.5 and clamps, as
    the rasterizer preprocess does — forward.cu:20-71 semantics).

    Degree ceiling: the reference's eval_sh (sh_utils.py:49-58) carries C4
    terms, but its own pipeline never exercises them — sh_degree is 3
    everywhere (arguments/__init__.py, scene/ptgs/gaussian_model.py) and
    the CUDA rasterizer (forward.cu:20-71) also stops at degree 3. The
    deg-4 branch is dead code upstream; this implementation deliberately
    asserts deg <= 3.
    """
    assert 0 <= deg <= 3
    result = C0 * sh[..., 0, :]
    if deg >= 1:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1, :]
            + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :]
        )
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg >= 3:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def eval_sh_color(deg: int, sh, dirs):
    """SH -> clamped RGB as the rasterizer does (forward.cu:66-70):
    color = max(eval_sh + 0.5, 0)."""
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)
