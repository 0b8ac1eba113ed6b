from .readers import (  # noqa: F401
    CameraInfo,
    SceneInfo,
    PointCloud,
    read_colmap_scene,
    read_blender_scene,
    read_city_scene,
    nerfpp_norm,
)
from .scene import Scene, SceneDataset  # noqa: F401
