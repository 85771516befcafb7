from .simcol import SimColDataset, SimColDataModule
from .c3vd import C3VDDataset, C3VDDataModule
from .combined import CombinedDataset, CombinedDataModule
from .pose import PoseDataset, PoseDataModule
from .loader import PrefetchLoader

__all__ = [
    "SimColDataset", "SimColDataModule",
    "C3VDDataset", "C3VDDataModule",
    "CombinedDataset", "CombinedDataModule",
    "PoseDataset", "PoseDataModule",
    "PrefetchLoader",
]
