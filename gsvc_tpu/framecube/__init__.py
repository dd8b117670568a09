from gsvc_tpu.framecube.frame import Frame, FrameCubeDataset, frame_geometry
from gsvc_tpu.framecube.pointcloud import init_point_cloud, load_point_cloud

__all__ = [
    "Frame",
    "FrameCubeDataset",
    "frame_geometry",
    "init_point_cloud",
    "load_point_cloud",
]
