"""slamtpu — a TPU-native (JAX/XLA/Pallas) LiDAR-inertial SLAM framework.

Re-designed from scratch with the capabilities of the reference C++ stack
khalisfadil/slam-sam (Ouster + GNSS/INS decoding, NDT voxel-hash Gaussian maps,
Newton / Stein-Variational-Newton NDT registration, IMU preintegration and
factor-graph fusion), expressed as pure fixed-shape array programs.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 inputs (8-bit mantissa), which corrupts
# SE(3) chains and least-squares solves: on-device trajectories degrade ~4x
# vs float32 (measured). SLAM geometry needs true float32 everywhere; the
# registration hot path is gather-bound, so the MXU cost of this is noise.
_jax.config.update("jax_default_matmul_precision", "highest")
