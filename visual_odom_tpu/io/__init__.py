from visual_odom_tpu.io.kitti import (
    KittiSequence,
    load_poses,
    save_poses_kitti,
)
from visual_odom_tpu.io.camera import CameraSource, FakeCamera, ImageDirCamera
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence

__all__ = [
    "KittiSequence",
    "load_poses",
    "save_poses_kitti",
    "CameraSource",
    "FakeCamera",
    "ImageDirCamera",
    "SyntheticStereoSequence",
]
