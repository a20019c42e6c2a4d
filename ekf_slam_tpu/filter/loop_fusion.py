"""Loop-closure constraints fused into the EKF.

The reference emits loop constraints to a file (close_kitti_loops.py:141-143
writes BOTH frames' poses — exactly what a pose constraint needs) and
nothing consumes them (SURVEY.md §1: "coupling between the two halves is
conceptual only"). Here the constraint becomes a real EKF measurement.

Two forms:

* ``apply_loop_constraint`` — legacy 3-DoF position snap (round 1).
* ``apply_loop_constraint_pose`` — full 6-DoF pose constraint: position
  AND orientation of the camera measured against the matched frame's
  stored pose, with noise scaled by the geometric-verification inlier
  count (more inliers -> tighter constraint). The orientation residual is
  the small-angle rotation vector of the relative quaternion
  e = 2·vec(q_j⁻¹ ⊗ q), whose Jacobian w.r.t. q is two rows of the LEFT
  quaternion-product matrix (ops/quaternion.left_mult_matrix — the
  dq3_by_dq2.m kernel), making the update linear in q. Both updates are
  masked by `enabled` so they stay branchless under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ekf_slam_tpu.filter import ekf
from ekf_slam_tpu.ops import quaternion as quat


def apply_loop_constraint(x: jnp.ndarray, P: jnp.ndarray,
                          z_pos: jnp.ndarray, sigma: float,
                          enabled: jnp.ndarray):
    """Masked position-measurement update (legacy 3-DoF snap). z_pos: (3,)
    the loop-closed position; enabled: () bool. Returns (x_new, P_new)."""
    D = x.shape[0]
    dtype = x.dtype
    H = jnp.zeros((3, D), dtype).at[:, 0:3].set(jnp.eye(3, dtype=dtype))
    mask = jnp.broadcast_to(enabled, (3,))
    r = jnp.full((3,), sigma * sigma, dtype)
    return ekf.update(x, P, H, z_pos, x[0:3], mask, r)


def loop_noise_sigmas(inliers: jnp.ndarray, base_pos: float = 0.5,
                      base_rot: float = 0.2, ref_inliers: int = 8):
    """Verification-quality-scaled constraint noise: sigma shrinks as
    1/sqrt(inliers/ref) — the constraint is the mean of `inliers`
    independent geometric agreements (cv2.findFundamentalMat inlier set,
    close_kitti_loops.py:47-51). Returns (sigma_pos, sigma_rot)."""
    scale = jnp.sqrt(ref_inliers / jnp.maximum(
        inliers.astype(jnp.float32), 1.0))
    return base_pos * scale, base_rot * scale


def apply_loop_constraint_pose(x: jnp.ndarray, P: jnp.ndarray,
                               pose_j: jnp.ndarray, sigma_pos,
                               sigma_rot, enabled: jnp.ndarray):
    """Masked 6-DoF pose-constraint update against a stored frame pose.

    pose_j: (7,) [r_j(3), q_j(4)] — the matched DB frame's pose (both
    poses of close_kitti_loops.py:141-143, consumed instead of filed).
    Measurement rows:
      0:3  position residual   r − r_j          (H = I₃ on dims 0:3)
      3:6  orientation residual e = 2·vec(q_j⁻¹ ⊗ q)   (small-angle
           rotation vector; H = 2·L(q_j⁻¹)[1:4] on dims 3:7 — LINEAR in q)
    sigma_pos / sigma_rot: scalars or (,) arrays (see loop_noise_sigmas).
    Returns (x_new, P_new).
    """
    D = x.shape[0]
    dtype = x.dtype
    r_j, q_j = pose_j[0:3], pose_j[3:7]
    # Safe normalization: an EMPTY DB slot stores an all-zero pose, and the
    # branchless caller (models/loop_runner.make_frame_fn) evaluates this
    # update every frame with `enabled` masking it off — a bare divide by
    # ||0|| would NaN the gain and the NaN survives the masked ekf.update.
    # Fall back to the identity quaternion; with `enabled` True the stored
    # pose is a real unit quaternion so behavior is unchanged.
    nj = jnp.linalg.norm(q_j)
    q_j = jnp.where(nj > 1e-6, q_j / jnp.maximum(nj, 1e-6),
                    jnp.zeros(4, dtype).at[0].set(1.0))
    q = x[3:7]
    # Hemisphere alignment: q and -q are the same rotation; measure against
    # the representative nearest the current estimate so e stays small.
    sgn = jnp.where(jnp.sum(q * q_j) < 0, -1.0, 1.0).astype(dtype)
    q_j = q_j * sgn
    Lj = quat.left_mult_matrix(quat.qconj(q_j))     # (4, 4): q_j⁻¹ ⊗ (·)
    e = 2.0 * (Lj @ q)[1:4]

    H = jnp.zeros((6, D), dtype)
    H = H.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    H = H.at[3:6, 3:7].set(2.0 * Lj[1:4, :])
    z = jnp.concatenate([r_j, jnp.zeros(3, dtype)])
    h = jnp.concatenate([x[0:3], e])
    mask = jnp.broadcast_to(enabled, (6,))
    sp = jnp.broadcast_to(jnp.asarray(sigma_pos, dtype) ** 2, (3,))
    sr = jnp.broadcast_to(jnp.asarray(sigma_rot, dtype) ** 2, (3,))
    r_diag = jnp.concatenate([sp, sr])
    return ekf.update(x, P, H, z, h, mask, r_diag)
