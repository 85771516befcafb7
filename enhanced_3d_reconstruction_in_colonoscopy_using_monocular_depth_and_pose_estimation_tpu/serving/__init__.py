from .engine import DepthServingEngine

__all__ = ["DepthServingEngine"]
