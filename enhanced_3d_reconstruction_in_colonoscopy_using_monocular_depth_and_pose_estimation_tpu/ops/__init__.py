from . import quaternion
from .resize import resize_antialias, resize_align_corners, resize_nearest

__all__ = [
    "quaternion",
    "resize_antialias",
    "resize_align_corners",
    "resize_nearest",
]
