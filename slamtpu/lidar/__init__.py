from .ouster import (
    FrameAssembler,
    FrameGrid,
    LidarParams,
    Luts,
    SensorMeta,
    build_luts,
    packet_size,
    parse_packet,
    synthetic_os2_metadata,
)
from .project import ProjectionFilters, ScanBuffer, filters_from_params, project_frame

__all__ = [
    "SensorMeta",
    "LidarParams",
    "Luts",
    "build_luts",
    "packet_size",
    "parse_packet",
    "FrameAssembler",
    "FrameGrid",
    "synthetic_os2_metadata",
    "ProjectionFilters",
    "ScanBuffer",
    "project_frame",
    "filters_from_params",
]
