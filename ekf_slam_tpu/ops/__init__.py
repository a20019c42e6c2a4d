"""Low-level math ops: quaternion/rotation algebra, camera model, kernels."""

from ekf_slam_tpu.ops import quaternion, camera  # noqa: F401
