from . import linalg, se3, so3
from .se3 import Pose3

__all__ = ["so3", "se3", "linalg", "Pose3"]
