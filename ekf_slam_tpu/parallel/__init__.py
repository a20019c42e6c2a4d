from ekf_slam_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                        run_ensemble)

__all__ = ["make_mesh", "shard_batch", "replicate", "run_ensemble"]
