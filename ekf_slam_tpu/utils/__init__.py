"""Aux subsystems (SURVEY.md §5): metrics, tracing, numerics guards,
trajectory evaluation."""

from ekf_slam_tpu.utils.metrics import (MetricsLogger, check_finite,
                                        trace_annotation, step_timer)
from ekf_slam_tpu.utils.trajectory import (umeyama, align, ate_rmse, rpe,
                                           evaluate_trajectory)

__all__ = ["MetricsLogger", "check_finite", "trace_annotation", "step_timer",
           "umeyama", "align", "ate_rmse", "rpe", "evaluate_trajectory"]
