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
from pcp_tpu.scene.cameras import Camera, camera_device_arrays  # noqa: F401
