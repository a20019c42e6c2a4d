"""EKF-SLAM filter core (layers L2-L4): padded fixed-capacity masked state,
motion/measurement models with analytic Jacobians, Cholesky EKF updates,
map management, data association and 1-point RANSAC."""

from ekf_slam_tpu.filter.state import FilterState, init_state  # noqa: F401
