"""Loop-closure constraints fused into the EKF.

The reference emits loop constraints to a file (close_kitti_loops.py:141-143
writes both frames' positions) and nothing consumes them (SURVEY.md §1:
"coupling between the two halves is conceptual only"). Here the constraint
becomes a real EKF measurement: when the loop detector declares a match to
database frame j, the camera position is measured against frame j's stored
pose with noise sigma_loop — a 3-row linear update (H = [I3 0 ...]), masked
by the `enabled` flag so it stays branchless under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ekf_slam_tpu.filter import ekf


def apply_loop_constraint(x: jnp.ndarray, P: jnp.ndarray,
                          z_pos: jnp.ndarray, sigma: float,
                          enabled: jnp.ndarray):
    """Masked position-measurement update. z_pos: (3,) the loop-closed
    position; enabled: () bool. Returns (x_new, P_new)."""
    D = x.shape[0]
    dtype = x.dtype
    H = jnp.zeros((3, D), dtype).at[:, 0:3].set(jnp.eye(3, dtype=dtype))
    mask = jnp.broadcast_to(enabled, (3,))
    r = jnp.full((3,), sigma * sigma, dtype)
    return ekf.update(x, P, H, z_pos, x[0:3], mask, r)
