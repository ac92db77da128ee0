import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.utils import general, graphics, image, loss, manhattan, sh


# ----------------------------- graphics ------------------------------------

def test_qvec_rotmat_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = graphics.qvec_to_rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R), 1.0)
        q2 = graphics.rotmat_to_qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_fov_focal_inverse():
    assert math.isclose(graphics.fov2focal(graphics.focal2fov(800, 640), 640), 800)


def test_world_to_view_and_center(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = graphics.qvec_to_rotmat(q)
    t = rng.normal(size=3)
    W2C = graphics.world_to_view(R, t)
    center = graphics.camera_center_from_rt(R, t)
    # camera center maps to the origin of camera space
    mapped = W2C @ np.append(center, 1.0)
    np.testing.assert_allclose(mapped[:3], 0.0, atol=1e-10)


def test_projection_matrix_maps_frustum():
    znear, zfar = 0.01, 100.0
    fovx = fovy = math.radians(60)
    P = graphics.projection_matrix(znear, zfar, fovx, fovy)
    # center ray at znear -> ndc z=0 ; at zfar -> ndc z=1
    for z, expect in [(znear, 0.0), (zfar, 1.0)]:
        v = P @ np.array([0, 0, z, 1.0])
        assert np.isclose(v[2] / v[3], expect, atol=1e-9)
    # edge of frustum maps to |x| = 1
    x_edge = math.tan(fovx / 2) * 1.0
    v = P @ np.array([x_edge, 0, 1.0, 1.0])
    assert np.isclose(v[0] / v[3], 1.0)


# ----------------------------- quaternions (jnp) ---------------------------

def test_quat_to_rotmat_matches_numpy(rng):
    q = rng.normal(size=(8, 4))
    R_jnp = np.asarray(general.quat_to_rotmat(jnp.asarray(q)))
    for i in range(8):
        qn = q[i] / np.linalg.norm(q[i])
        np.testing.assert_allclose(R_jnp[i], graphics.qvec_to_rotmat(qn), atol=1e-5)


def test_covariance_psd(rng):
    scales = jnp.asarray(np.exp(rng.normal(size=(5, 3))))
    quats = jnp.asarray(rng.normal(size=(5, 4)))
    cov = np.asarray(general.covariance_from_scaling_rotation(scales, quats))
    for c in cov:
        np.testing.assert_allclose(c, c.T, atol=1e-5)
        assert np.all(np.linalg.eigvalsh(c) > 0)


def test_strip_symmetric_order(rng):
    cov = general.covariance_from_scaling_rotation(
        jnp.ones((1, 3)), jnp.asarray([[1.0, 0, 0, 0]]))
    s = np.asarray(general.strip_symmetric(cov))[0]
    np.testing.assert_allclose(s, [1, 0, 0, 1, 0, 1], atol=1e-6)


# ----------------------------- LR schedule ---------------------------------

def test_expon_lr_endpoints():
    lr0 = general.expon_lr(0, 1e-2, 1e-4, max_steps=100)
    lrN = general.expon_lr(100, 1e-2, 1e-4, max_steps=100)
    assert np.isclose(float(lr0), 1e-2, rtol=1e-4)
    assert np.isclose(float(lrN), 1e-4, rtol=1e-4)
    # log-linear midpoint
    lr_mid = general.expon_lr(50, 1e-2, 1e-4, max_steps=100)
    assert np.isclose(float(lr_mid), 1e-3, rtol=1e-4)


# ----------------------------- SH ------------------------------------------

def test_sh_deg0_constant(rng):
    coeffs = jnp.asarray(rng.normal(size=(4, 16, 3)))
    dirs = jnp.asarray(rng.normal(size=(4, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out), sh.C0 * np.asarray(coeffs[:, 0]), rtol=1e-6)


def test_rgb_sh_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(10, 3)))
    np.testing.assert_allclose(
        np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb), rtol=1e-5, atol=1e-6
    )


def test_sh_orthogonality_integral(rng):
    # Monte-Carlo: int Y_i Y_j dOmega ~ delta_ij -> eval with unit coeff on
    # basis i only, correlate over random dirs.
    n = 50_000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    vals = []
    for basis in range(9):
        c = np.zeros((1, 9, 3))
        c[0, basis, 0] = 1.0
        coeffs = jnp.broadcast_to(jnp.asarray(c), (n, 9, 3))
        vals.append(np.asarray(sh.eval_sh(2, coeffs, dirs))[:, 0])
    vals = np.stack(vals)
    gram = vals @ vals.T / n * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.1)


# ----------------------------- losses --------------------------------------

def test_ssim_self_is_one(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    assert float(loss.ssim(img, img)) > 0.9999


def test_ssim_decreases_with_noise(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    noisy = jnp.clip(img + 0.3 * jnp.asarray(rng.normal(size=(3, 32, 32)).astype(np.float32)), 0, 1)
    assert float(loss.ssim(img, noisy)) < 0.8


def test_ssim_matches_scipy_reference(rng):
    # cross-check against an independent direct implementation
    from scipy.ndimage import convolve

    img1 = rng.uniform(size=(1, 24, 24)).astype(np.float64)
    img2 = np.clip(img1 + 0.1 * rng.normal(size=(1, 24, 24)), 0, 1)

    xs = np.arange(11) - 5
    g = np.exp(-(xs ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    w = np.outer(g, g)

    def blur(x):
        return convolve(x[0], w, mode="constant")[None]

    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 ** 2
    s2 = blur(img2 * img2) - mu2 ** 2
    s12 = blur(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    expect = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
              / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean()
    got = float(loss.ssim(jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32)))
    assert np.isclose(got, expect, atol=1e-4)


def test_photometric_loss_weights(rng):
    a = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
    full = float(loss.photometric_loss(a, a, b, lambda_dssim=0.0))
    assert np.isclose(full, float(loss.l1_loss(a, b)), rtol=1e-6)


# ----------------------------- image metrics -------------------------------

def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8))
    b = jnp.full((1, 8, 8), 0.1)
    np.testing.assert_allclose(float(image.psnr(a, b)[0]), 20.0, rtol=1e-5)


def test_color_correct_recovers_affine(rng):
    img = rng.uniform(0.1, 0.9, size=(32, 32, 3)).astype(np.float32)
    ref = np.clip(img * 0.8 + 0.05, 0, 1)
    out = np.asarray(image.color_correct(jnp.asarray(img), jnp.asarray(ref)))
    assert np.abs(out - ref).mean() < 5e-3


# ----------------------------- manhattan -----------------------------------

def test_man_trans_identity():
    man = manhattan.get_man_trans("0 0 0", "0 0 0")
    np.testing.assert_allclose(man, np.eye(4), atol=1e-12)


def test_man_trans_none_when_unset():
    assert manhattan.get_man_trans("", "") is None


def test_man_trans_extrinsic_consistency(rng):
    # applying man_trans to points and its inverse-compose to extrinsics must
    # leave camera-space coordinates unchanged
    man = manhattan.get_man_trans("1 2 3", "-45 0.03 0.91")
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = graphics.qvec_to_rotmat(q)
    t = rng.normal(size=3)
    pts = rng.normal(size=(10, 3))
    cam_before = pts @ R.T + t
    pts_new = manhattan.apply_man_trans_points(pts, man)
    R2, t2 = manhattan.apply_man_trans_extrinsics(R, t, man)
    cam_after = pts_new @ R2.T + t2
    np.testing.assert_allclose(cam_after, cam_before, atol=1e-9)
