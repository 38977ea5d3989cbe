from . import geodesy, gravity
from .anpp import AnppDecoder, NavFrame, interpolate
from .geodesy import lla2ned, ned2lla, symmetrical_angle
from .gravity import gravity_wgs84
from .imu_config import ImuConfig

__all__ = [
    "AnppDecoder",
    "NavFrame",
    "interpolate",
    "geodesy",
    "gravity",
    "lla2ned",
    "ned2lla",
    "symmetrical_angle",
    "gravity_wgs84",
    "ImuConfig",
]
