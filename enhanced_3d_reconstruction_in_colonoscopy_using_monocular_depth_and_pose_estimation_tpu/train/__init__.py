from .optim import onecycle_schedule, make_depth_optimizer, make_pose_optimizer
from .depth_task import DepthTask, DepthTrainState
from .pose_task import PoseTask, PoseTrainState

__all__ = [
    "onecycle_schedule",
    "make_depth_optimizer",
    "make_pose_optimizer",
    "DepthTask",
    "DepthTrainState",
    "PoseTask",
    "PoseTrainState",
]
