"""Application pipelines mirroring the reference executables (SURVEY.md 2.5):

| reference executable             | app                      |
|----------------------------------|--------------------------|
| pipeline_lo_svn                  | lo_svn.LoSvnApp          |
| pipeline (NDT_OMP + iSAM2)       | odom_ndt.OdomNdtApp      |
| pipeline_ligo_tc                 | ligo_tc.LigoTcApp        |
| pipeline_ins_map_distribution    | ins_map.InsMapApp        |
| pipeline_calib_compass           | calib_compass.CalibCompassApp |
| viz_lidar_udp                    | viz_lidar.VizLidarApp    |
"""
from .calib_compass import CalibCompassApp
from .common import IngestPipeline, TrajectoryEntry, ate_rmse, ins_pose_ned
from .ins_map import InsMapApp
from .ligo_tc import LigoTcApp
from .lo_svn import LoSvnApp
from .odom_ndt import OdomNdtApp
from .viz_lidar import VizLidarApp

__all__ = [
    "IngestPipeline",
    "TrajectoryEntry",
    "ate_rmse",
    "ins_pose_ned",
    "LoSvnApp",
    "OdomNdtApp",
    "LigoTcApp",
    "InsMapApp",
    "CalibCompassApp",
    "VizLidarApp",
]
