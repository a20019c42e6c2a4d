from ekf_slam_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                        run_ensemble)
from ekf_slam_tpu.parallel.sharded_filter import (make_sharded_step,
                                                  shard_state_batch,
                                                  pad_state, unpad_state,
                                                  padded_dim)

__all__ = ["make_mesh", "shard_batch", "replicate", "run_ensemble",
           "make_sharded_step", "shard_state_batch", "pad_state",
           "unpad_state", "padded_dim"]
