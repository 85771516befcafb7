from .dinov2 import DinoViT, VIT_ARCHS, INTERMEDIATE_LAYER_IDX
from .dpt import DPTHead
from .depth_anything import DepthAnythingV2, MODEL_CONFIGS, build_depth_model
from .resnet_pose import PoseEstimationNet

__all__ = [
    "DinoViT",
    "VIT_ARCHS",
    "INTERMEDIATE_LAYER_IDX",
    "DPTHead",
    "DepthAnythingV2",
    "MODEL_CONFIGS",
    "build_depth_model",
    "PoseEstimationNet",
]
