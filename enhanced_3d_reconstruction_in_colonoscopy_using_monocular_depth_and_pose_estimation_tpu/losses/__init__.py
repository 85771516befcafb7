from .silog import silog_loss
from .pose_loss import pose_loss

__all__ = ["silog_loss", "pose_loss"]
