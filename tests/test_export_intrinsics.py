"""Per-block COLMAP export preserves the full global intrinsics table.

The reference copies the global cameras.bin to every block and each image
keeps its own camera_id (save_partition.py:150-168); a multi-intrinsic
capture (several rigs/lenses) must round-trip both intrinsics through a
block's sparse/0.
"""

import numpy as np

from pcp_tpu.io import colmap
from pcp_tpu.partition.export import export_partition
from pcp_tpu.partition.types import Box2D, PartitionRecord
from pcp_tpu.scene.dataset import load_colmap_scene
from pcp_tpu.utils.graphics import rotmat_to_qvec


def _write_two_intrinsic_scene(root, rng):
    sparse = root / "sparse" / "0"
    cams = {
        1: colmap.Camera(1, "PINHOLE", 64, 48,
                         np.array([80.0, 82.0, 32.0, 24.0])),
        7: colmap.Camera(7, "PINHOLE", 128, 96,
                         np.array([200.0, 195.0, 64.0, 48.0])),
    }
    imgs = {}
    for i in range(6):
        R = np.eye(3)
        imgs[i + 1] = colmap.Image(
            i + 1, rotmat_to_qvec(R),
            np.array([0.1 * i, 0.0, 2.0 + i]),
            1 if i % 2 == 0 else 7,
            f"im{i}.jpg",
        )
    n = 50
    pts = colmap.Points3D.from_arrays(
        rng.uniform(-1, 1, (n, 3)), rng.integers(0, 255, (n, 3)).astype(np.uint8)
    )
    colmap.write_model(cams, imgs, pts, str(sparse), ext=".bin")
    return cams, imgs


def test_block_export_keeps_both_intrinsics(tmp_path, rng):
    cams, imgs = _write_two_intrinsic_scene(tmp_path, rng)
    scene = load_colmap_scene(str(tmp_path))

    box = Box2D(-10, -10, 10, 10)
    rec = PartitionRecord(
        partition_id="0",
        origin_box=box, extend_box=box, point_box=box,
        point_indices=np.arange(len(scene.points)),
        camera_uids=list(range(len(scene.cameras))),
    )
    block_dir = export_partition(scene, rec, str(tmp_path / "visible"),
                                 copy_images=False)

    bcams, bimgs, _ = colmap.read_model(block_dir + "/sparse/0")
    # full global intrinsics table copied wholesale
    assert set(bcams.keys()) == {1, 7}
    for cid in (1, 7):
        assert bcams[cid].model == cams[cid].model
        np.testing.assert_allclose(bcams[cid].params, cams[cid].params)
        assert (bcams[cid].width, bcams[cid].height) == (
            cams[cid].width, cams[cid].height,
        )
    # every exported image keeps its true camera_id
    by_name = {im.name: im for im in bimgs.values()}
    for im in imgs.values():
        assert by_name[im.name].camera_id == im.camera_id
