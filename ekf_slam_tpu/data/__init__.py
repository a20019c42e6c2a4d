from ekf_slam_tpu.data.synthetic import (synthetic_batch, class_weights,
                                         aliased_batches)

__all__ = ["synthetic_batch", "class_weights", "aliased_batches"]
