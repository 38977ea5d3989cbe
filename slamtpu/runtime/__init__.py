from . import export, replay, stats, sync, udp
from .config import PipelineConfig, RegisterConfig
from .replay import STREAM_COMPASS, STREAM_LIDAR, ReplayWriter, read_replay
from .stats import KeyFrameStats, StageTimer, StatsArchive
from .sync import SyncedFrame, Synchronizer, interpolate_at

__all__ = [
    "PipelineConfig",
    "RegisterConfig",
    "ReplayWriter",
    "read_replay",
    "STREAM_LIDAR",
    "STREAM_COMPASS",
    "SyncedFrame",
    "Synchronizer",
    "interpolate_at",
    "KeyFrameStats",
    "StatsArchive",
    "StageTimer",
    "export",
    "replay",
    "stats",
    "sync",
    "udp",
]
