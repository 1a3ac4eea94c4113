"""imagepipe_tpu: a TPU-native batched RAW-development engine.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
Rust crate `imagepipe` (pedrocr/imagepipe): any camera RAW or raster image ->
8/16-bit sRGB through a fixed 8-stage pipeline with content-addressed stage
caching -- plus a new batch dimension sharded over TPU meshes.
"""

from . import color as color_conversions
from .spline import SplineFunc

__version__ = "0.1.0"

__all__ = ["color_conversions", "SplineFunc"]
