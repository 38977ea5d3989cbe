"""slamtpu — a TPU-native (JAX/XLA/Pallas) LiDAR-inertial SLAM framework.

Re-designed from scratch with the capabilities of the reference C++ stack
khalisfadil/slam-sam (Ouster + GNSS/INS decoding, NDT voxel-hash Gaussian maps,
Newton / Stein-Variational-Newton NDT registration, IMU preintegration and
factor-graph fusion), expressed as pure fixed-shape array programs.
"""

__version__ = "0.1.0"
