"""COLMAP binary/text round-trip tests (reference contract:
colmap_loader.py readers <-> read_write_model.py writers)."""

import numpy as np
import pytest

from pcp_tpu.io import colmap


def make_model(rng):
    cameras = {
        1: colmap.Camera(1, "PINHOLE", 1920, 1080, np.array([1000.0, 990.0, 960.0, 540.0])),
        2: colmap.Camera(2, "SIMPLE_PINHOLE", 640, 480, np.array([500.0, 320.0, 240.0])),
    }
    images = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        n2d = int(rng.integers(0, 6))
        images[i] = colmap.Image(
            id=i, qvec=q, tvec=rng.normal(size=3), camera_id=1 + i % 2,
            name=f"img_{i:03d}.jpg",
            xys=rng.uniform(0, 640, size=(n2d, 2)),
            point3D_ids=rng.integers(-1, 50, size=n2d).astype(np.int64),
        )
    n = 20
    tlen = rng.integers(0, 4, size=n).astype(np.int64)
    total = int(tlen.sum())
    points = colmap.Points3D(
        ids=np.arange(10, 10 + n, dtype=np.int64),
        xyz=rng.normal(size=(n, 3)) * 10,
        rgb=rng.integers(0, 256, size=(n, 3)).astype(np.uint8),
        error=rng.uniform(0, 2, size=n),
        track_lengths=tlen,
        track_image_ids=rng.integers(1, 4, size=total).astype(np.int32),
        track_point2D_idxs=rng.integers(0, 5, size=total).astype(np.int32),
    )
    return cameras, images, points


def assert_models_equal(a, b, atol=0.0):
    cam_a, img_a, pts_a = a
    cam_b, img_b, pts_b = b
    assert set(cam_a) == set(cam_b)
    for k in cam_a:
        assert cam_a[k].model == cam_b[k].model
        assert cam_a[k].width == cam_b[k].width and cam_a[k].height == cam_b[k].height
        np.testing.assert_allclose(cam_a[k].params, cam_b[k].params, atol=atol)
    assert set(img_a) == set(img_b)
    for k in img_a:
        np.testing.assert_allclose(img_a[k].qvec, img_b[k].qvec, atol=atol)
        np.testing.assert_allclose(img_a[k].tvec, img_b[k].tvec, atol=atol)
        assert img_a[k].camera_id == img_b[k].camera_id
        assert img_a[k].name == img_b[k].name
        np.testing.assert_allclose(img_a[k].xys, img_b[k].xys, atol=atol)
        np.testing.assert_array_equal(img_a[k].point3D_ids, img_b[k].point3D_ids)
    np.testing.assert_array_equal(pts_a.ids, pts_b.ids)
    np.testing.assert_allclose(pts_a.xyz, pts_b.xyz, atol=atol)
    np.testing.assert_array_equal(pts_a.rgb, pts_b.rgb)
    np.testing.assert_allclose(pts_a.error, pts_b.error, atol=atol)
    np.testing.assert_array_equal(pts_a.track_lengths, pts_b.track_lengths)
    np.testing.assert_array_equal(pts_a.track_image_ids, pts_b.track_image_ids)
    np.testing.assert_array_equal(pts_a.track_point2D_idxs, pts_b.track_point2D_idxs)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_roundtrip(tmp_path, rng, ext):
    model = make_model(rng)
    colmap.write_model(*model, str(tmp_path), ext=ext)
    back = colmap.read_model(str(tmp_path))
    assert_models_equal(model, back, atol=0 if ext == ".bin" else 1e-12)


def test_negative_point3d_ids_preserved(tmp_path, rng):
    # -1 ids (unmatched features) must survive the binary record layout.
    _, images, _ = make_model(rng)
    im = images[1]
    im.point3D_ids = np.full(len(im.xys), -1, np.int64)
    colmap.write_images_binary({1: im}, str(tmp_path / "images.bin"))
    back = colmap.read_images_binary(str(tmp_path / "images.bin"))
    np.testing.assert_array_equal(back[1].point3D_ids, im.point3D_ids)


def test_points3d_select(rng):
    _, _, pts = make_model(rng)
    sub = pts.select(np.arange(5, 15))
    assert len(sub) == 10
    np.testing.assert_array_equal(sub.ids, pts.ids[5:15])
    offs = pts.track_offsets
    expect = pts.track_image_ids[offs[5]:offs[15]]
    np.testing.assert_array_equal(sub.track_image_ids, expect)


def test_camera_focal():
    c = colmap.Camera(1, "SIMPLE_PINHOLE", 64, 48, np.array([100.0, 32.0, 24.0]))
    assert c.focal == (100.0, 100.0)
    c2 = colmap.Camera(1, "PINHOLE", 64, 48, np.array([100.0, 90.0, 32.0, 24.0]))
    assert c2.focal == (100.0, 90.0)


def test_native_codec_matches_python(tmp_path, rng):
    """The C++ codec and the pure-Python path must be byte-identical."""
    from pcp_tpu.io import colmap
    from pcp_tpu.native import load_library

    lib = load_library()
    assert lib is not None, "g++ toolchain expected in this environment"

    n = 500
    tlen = rng.integers(0, 6, n).astype(np.int64)
    tt = int(tlen.sum())
    pts = colmap.Points3D(
        ids=rng.integers(1, 10**6, n).astype(np.int64),
        xyz=rng.normal(size=(n, 3)),
        rgb=rng.integers(0, 256, (n, 3)).astype(np.uint8),
        error=rng.uniform(0, 2, n),
        track_lengths=tlen,
        track_image_ids=rng.integers(1, 50, tt).astype(np.int32),
        track_point2D_idxs=rng.integers(0, 1000, tt).astype(np.int32),
    )
    p = str(tmp_path / "points3D.bin")
    colmap.write_points3D_binary(pts, p)  # native write
    back = colmap.read_points3D_binary(p)  # native read
    np.testing.assert_array_equal(back.ids, pts.ids)
    np.testing.assert_allclose(back.xyz, pts.xyz)
    np.testing.assert_array_equal(back.track_image_ids, pts.track_image_ids)

    # cross-check: native blob == pure-Python blob
    from pcp_tpu.io import colmap_fast

    blob_native = colmap_fast.write_points3d_binary_native(
        pts.ids, pts.xyz, pts.rgb, pts.error, pts.track_lengths,
        pts.track_image_ids, pts.track_point2D_idxs,
    )
    import io as _io
    import struct as _struct

    with open(p, "rb") as f:
        assert f.read() == blob_native

    imgs = {
        i: colmap.Image(
            i, rng.normal(size=4), rng.normal(size=3), 1, f"img_{i}.jpg",
            xys=rng.uniform(size=(3, 2)),
            point3D_ids=rng.integers(-1, 100, 3).astype(np.int64),
        )
        for i in range(1, 6)
    }
    pi = str(tmp_path / "images.bin")
    colmap.write_images_binary(imgs, pi)
    back_imgs = colmap.read_images_binary(pi)  # native read path
    assert set(back_imgs) == set(imgs)
    for k in imgs:
        np.testing.assert_allclose(back_imgs[k].qvec, imgs[k].qvec)
        assert back_imgs[k].name == imgs[k].name
        np.testing.assert_array_equal(
            back_imgs[k].point3D_ids, imgs[k].point3D_ids
        )
