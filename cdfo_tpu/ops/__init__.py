from .warp import flow_warp
from .resize import interpolate_bilinear, pixel_shuffle

__all__ = ["flow_warp", "interpolate_bilinear", "pixel_shuffle"]
