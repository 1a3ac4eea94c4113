from . import gofloat, demosaic, rotatecrop, colorspaces, curves, gamma, transform
from .base import ImageOp
from .transform import Rotation

__all__ = ["gofloat", "demosaic", "rotatecrop", "colorspaces", "curves",
           "gamma", "transform", "ImageOp", "Rotation"]
