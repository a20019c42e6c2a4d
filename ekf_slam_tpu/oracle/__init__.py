"""NumPy float64 oracle of the reference MonoSLAM equations (test golden)."""

from ekf_slam_tpu.oracle import oracle  # noqa: F401
