"""Synthetic COLMAP scene factory for end-to-end tests.

Builds a tiny scene whose ground-truth images are themselves rendered from a
known Gaussian set with pcp_tpu's rasterizer, so training on it must converge
(self-realisable target). Written as a real COLMAP dataset
(images/ + sparse/0/*.bin) so the loaders get exercised too — the layout the
reference consumes (README.md:106-112).
"""

from __future__ import annotations

import os

import numpy as np


def look_at_w2c(pos, target, up=(0.0, 0.0, 1.0)):
    """World->camera extrinsics (R, t), camera +z toward ``target``,
    +y down-ish (COLMAP convention)."""
    pos = np.asarray(pos, np.float64)
    fwd = np.asarray(target, np.float64) - pos
    fwd /= np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(fwd, upv)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # rows: cam axes in world
    t = -R @ pos
    return R, t


def make_gaussian_cloud(rng, n=120, extent=1.5):
    xyz = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.08, 0.22, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, size=n).astype(np.float32)
    return xyz, rgb, scales, quats, opac


def render_true_scene(xyz, rgb, scales, quats, opac, R, t, fx, fy, W, H):
    import jax.numpy as jnp

    from pcp_tpu.ops.projection import CameraIntrin
    from pcp_tpu.ops.rasterize import rasterize
    from pcp_tpu.utils.sh import rgb_to_sh

    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, :3] = R
    viewmat[:3, 3] = t
    sh = rgb_to_sh(jnp.asarray(rgb))[:, None, :]
    intrin = CameraIntrin(
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
    )
    img, _ = rasterize(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), sh, jnp.asarray(viewmat), intrin, (W, H),
        jnp.zeros(3), 0,
    )
    return np.clip(np.asarray(img), 0.0, 1.0)


def write_synthetic_scene(
    out_dir: str,
    rng=None,
    n_points: int = 120,
    n_cams: int = 10,
    W: int = 64,
    H: int = 48,
    radius: float = 5.0,
    image_ext: str = "png",
    appearance_jitter: float = 0.0,
    appearance_field: float = 0.0,
    jitter_holdout: int = 0,
    jitter_atten_only: bool = False,
    rings=None,
):
    """Create `<out_dir>/{images/, sparse/0/*.bin}`; returns the true
    Gaussian tuple for oracle comparisons.

    ``appearance_jitter`` > 0 applies a per-VIEW exposure/white-balance
    gain to each saved GT image (log-uniform in ±jitter, one exposure
    scalar x three channel gains) — the real-photo variation the
    reference's appearance-decoupling network exists to absorb
    (scene/ptgs/appearance_network.py:7-61; train.py:111-117 trains L1 on
    the decoupled image). The underlying radiance field stays consistent,
    so appearance-ON training should recover it and beat appearance-OFF
    on color-corrected held-out PSNR.

    ``appearance_field`` > 0 additionally applies a per-view LOW-FREQUENCY
    spatial gain field (bilinear-upsampled 4x4 grid, log-uniform in
    ±field) — vignetting / local lighting drift. A global per-view gain
    is fully absorbed by the eval-time multinerf color fit for ANY model,
    so it cannot separate appearance-ON from OFF; a spatial field can:
    per-Gaussian colors cannot represent it (OFF bakes in ghosting) while
    the reference's pixel-wise appearance CNN absorbs it in training."""
    from PIL import Image as PILImage

    from pcp_tpu.io import colmap

    rng = rng or np.random.default_rng(0)
    xyz, rgb, scales, quats, opac = make_gaussian_cloud(rng, n_points)
    fx = fy = 0.9 * W

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    cams = {1: colmap.Camera(1, "PINHOLE", W, H, np.array([fx, fy, W / 2, H / 2]))}
    imgs = {}
    from pcp_tpu.utils.graphics import rotmat_to_qvec

    # ``rings``: optional [(radius, count), ...] replacing the single
    # ring — e.g. a far ring plus a close-in ring gives two genuinely
    # distinct per-view tile-load profiles (close views see fat splats
    # concentrated in few tiles), the workload view classes exist for
    # (binning.cluster_views). Default: one ring of ``n_cams``.
    ring_of = []
    if rings is None:
        ring_radii = [(radius, n_cams)]
    else:
        ring_radii = list(rings)
    cam_specs = []
    for ring_idx, (r_ring, cnt) in enumerate(ring_radii):
        for k in range(cnt):
            cam_specs.append((r_ring, 2 * np.pi * k / cnt))
            ring_of.append(ring_idx)

    for i, (r_i, ang) in enumerate(cam_specs):
        pos = np.array(
            [r_i * np.cos(ang), r_i * np.sin(ang),
             1.5 * (r_i / radius) + 0.5 * (r_i / radius) * np.sin(3 * ang)]
        )
        R, t = look_at_w2c(pos, (0.0, 0.0, 0.0))
        img = render_true_scene(xyz, rgb, scales, quats, opac, R, t, fx, fy, W, H)
        # ``jitter_holdout`` > 0: every holdout-th view (the llffhold eval
        # split convention) stays CLEAN. The appearance net exists to keep
        # per-view capture variation out of the radiance field
        # (appearance_network.py:7-17); a held-out view's jitter is
        # unpredictable noise for ANY model, so scoring against jittered
        # test GT measures luck, not decoupling — scoring against the
        # clean field measures exactly the quantity the net protects.
        clean = jitter_holdout > 0 and i % jitter_holdout == 0
        if appearance_jitter > 0.0 and not clean:
            j = appearance_jitter
            if jitter_atten_only:
                # Same log-widths shifted into the ATTENUATION domain
                # (every gain <= 1). The reference's transformation map is
                # a sigmoid (appearance_network.py:59) — multiplicative in
                # (0, 1) — so gains > 1 are structurally inexpressible
                # (dbg_appearance measures the map clipping at ~0.998 on
                # gain-1.2 views); this mode keeps the jitter inside the
                # map's design domain.
                exposure = np.exp(rng.uniform(-2 * j, 0.0))
                wb = np.exp(rng.uniform(-j, 0.0, size=3))
            else:
                exposure = np.exp(rng.uniform(-j, j))
                wb = np.exp(rng.uniform(-j / 2, j / 2, size=3))
            img = np.clip(img * (exposure * wb)[None, None, :], 0.0, 1.0)
        if appearance_field > 0.0 and not clean:
            # per-view-strength VIGNETTE: the systematic spatial capture
            # variation the appearance net exists for. Unlike a zero-mean
            # random gain field (whose per-view average washes out of the
            # baked radiance field over the training set) a vignette is
            # one-sided — a model without per-view decoupling bakes the
            # MEAN corner falloff into the field and pays for it on every
            # clean held-out view, while the eval's global color fit
            # cannot absorb a spatial pattern.
            s = appearance_field * rng.uniform(0.3, 1.0)
            yy = (np.linspace(-1, 1, H) * (H / W))[:, None]
            xx = np.linspace(-1, 1, W)[None, :]
            r2 = (xx * xx + yy * yy) / (1 + (H / W) ** 2)
            img = np.clip(img * (1.0 - s * r2)[:, :, None], 0.0, 1.0)
        name = f"im{i:03d}.{image_ext}"
        PILImage.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name)
        )
        npts = min(20, n_points)
        imgs[i + 1] = colmap.Image(
            i + 1, rotmat_to_qvec(R), t, 1, name,
            xys=np.zeros((npts, 2)),
            point3D_ids=np.arange(npts, dtype=np.int64),
        )

    pts = colmap.Points3D.from_arrays(xyz, (rgb * 255).astype(np.uint8))
    colmap.write_model(cams, imgs, pts, os.path.join(out_dir, "sparse", "0"), ext=".bin")
    return xyz, rgb, scales, quats, opac
