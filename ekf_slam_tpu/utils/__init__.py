"""Aux subsystems (SURVEY.md §5): metrics, tracing, numerics guards."""

from ekf_slam_tpu.utils.metrics import (MetricsLogger, check_finite,
                                        trace_annotation, step_timer)

__all__ = ["MetricsLogger", "check_finite", "trace_annotation", "step_timer"]
