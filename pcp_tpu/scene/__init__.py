"""pcp_tpu.scene — scene loading: COLMAP datasets -> camera lists + clouds.

Replaces the reference's scene/dataset_readers.py + scene/cameras.py +
utils/camera_utils.py stack (Scene / PartitionScene / Scene_Eval wrappers,
scene/__init__.py:21-228).
"""

from pcp_tpu.scene.dataset import (  # noqa: F401
    CameraInfo,
    SceneInfo,
    load_colmap_scene,
    nerfpp_extent,
    split_train_test,
)
from pcp_tpu.scene.blender import is_blender_scene, load_blender_scene  # noqa: F401
from pcp_tpu.scene.cameras import Camera, camera_device_arrays  # noqa: F401

# sceneLoadTypeCallbacks parity (dataset_readers.py:525-531): the Vast /
# Eval / Partition variants are parameterisations of load_colmap_scene used
# by the wrappers in pcp_tpu.scene.wrappers.
scene_load_callbacks = {
    "Colmap": load_colmap_scene,
    "Blender": load_blender_scene,
}


def load_scene(source_path: str, *, white_background: bool = False,
               eval_split: bool = True, images_dir: str = "images",
               man_trans=None, **kwargs):
    """Sniff the dataset type like the reference Scene.__init__
    (scene/__init__.py:40-47): transforms_train.json -> Blender, else
    COLMAP sparse/."""
    if is_blender_scene(source_path):
        return load_blender_scene(
            source_path, white_background=white_background,
            eval_split=eval_split, **kwargs,
        )
    return load_colmap_scene(
        source_path, images_dir=images_dir, man_trans=man_trans, **kwargs
    )
