import numpy as np
import pytest

from pcp_tpu.io import ply


@pytest.mark.parametrize("fmt", ["binary_little_endian", "ascii"])
def test_generic_roundtrip(tmp_path, rng, fmt):
    fields = {
        "x": rng.normal(size=10).astype(np.float32),
        "y": rng.normal(size=10).astype(np.float32),
        "red": rng.integers(0, 255, size=10).astype(np.uint8),
    }
    p = str(tmp_path / "a.ply")
    ply.write_ply(p, fields, fmt=fmt)
    back = ply.read_ply(p)
    for k in fields:
        np.testing.assert_allclose(back[k].astype(np.float64), fields[k].astype(np.float64), rtol=1e-6)


def test_point_cloud_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)) * 5
    rgb = rng.integers(0, 256, size=(50, 3))
    p = str(tmp_path / "points3d.ply")
    ply.store_point_cloud(p, xyz, rgb)
    pts, cols, nrm = ply.fetch_point_cloud(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-5)
    np.testing.assert_allclose(cols * 255, rgb, atol=0.5)
    np.testing.assert_array_equal(nrm, 0)


def test_gaussian_schema_roundtrip(tmp_path, rng):
    n, deg = 17, 3
    k = (deg + 1) ** 2
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    f_dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    f_rest = rng.normal(size=(n, k - 1, 3)).astype(np.float32)
    opacity = rng.normal(size=(n, 1)).astype(np.float32)
    scaling = rng.normal(size=(n, 3)).astype(np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    p = str(tmp_path / "point_cloud.ply")
    ply.save_gaussian_ply(p, xyz, f_dc, f_rest, opacity, scaling, rotation)

    # field names must match gaussian_model.py:189-201 schema exactly
    raw = ply.read_ply(p)
    expect = (["x", "y", "z", "nx", "ny", "nz"]
              + [f"f_dc_{i}" for i in range(3)]
              + [f"f_rest_{i}" for i in range(3 * (k - 1))]
              + ["opacity"] + [f"scale_{i}" for i in range(3)]
              + [f"rot_{i}" for i in range(4)])
    assert list(raw.keys()) == expect

    back = ply.load_gaussian_ply(p)
    np.testing.assert_allclose(back["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(back["f_dc"], f_dc, rtol=1e-6)
    np.testing.assert_allclose(back["f_rest"], f_rest, rtol=1e-6)
    np.testing.assert_allclose(back["opacity"], opacity, rtol=1e-6)
    np.testing.assert_allclose(back["scaling"], scaling, rtol=1e-6)
    np.testing.assert_allclose(back["rotation"], rotation, rtol=1e-6)
