from .depth_metrics import compute_depth_errors, DEPTH_METRIC_NAMES
from .pose_metrics import (
    compute_ate,
    compute_rte,
    compute_rote,
    compute_pose_errors,
    calculate_scale_factor,
    evaluate_trajectory,
)

__all__ = [
    "compute_depth_errors",
    "DEPTH_METRIC_NAMES",
    "compute_ate",
    "compute_rte",
    "compute_rote",
    "compute_pose_errors",
    "calculate_scale_factor",
    "evaluate_trajectory",
]
