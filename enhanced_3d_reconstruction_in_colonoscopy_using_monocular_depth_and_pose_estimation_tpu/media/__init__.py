from .colormap import depth_to_heatmap, colorize_depth, side_by_side

__all__ = ["depth_to_heatmap", "colorize_depth", "side_by_side"]
