from .dtypes import DtypePolicy, POLICY_BF16, POLICY_F32
from .metrics import MeanAccumulator, MetricBank

__all__ = [
    "DtypePolicy",
    "POLICY_BF16",
    "POLICY_F32",
    "MeanAccumulator",
    "MetricBank",
]
