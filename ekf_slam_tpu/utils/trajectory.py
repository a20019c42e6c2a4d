"""Trajectory evaluation: Umeyama alignment, ATE, RPE.

Standard SLAM accuracy metrics (Sturm et al., "A Benchmark for the
Evaluation of RGB-D SLAM Systems", IROS 2012) the reference lacks — its
MATLAB driver only overlays the estimated camera on the plot
(mono_slam.m / plots.m) and the repo's own accuracy statements so far
used ad-hoc mean position error (bench.py, tools/measure_pstore_drift.py).
This module gives the framework a principled, batched evaluation path:

* `umeyama` — closed-form least-squares rigid/similarity alignment
  (Umeyama, IEEE TPAMI 1991): the SE(3)/Sim(3) gauge freedom of a
  monocular SLAM estimate must be removed before comparing to ground
  truth (the reference's inverse-depth EKF observes neither global pose
  nor, strictly, scale — scale is pinned only by the calibrated motion
  prior).
* `ate_rmse` — absolute trajectory error after alignment.
* `rpe` — relative pose error over a horizon `delta`: drift per step,
  independent of global alignment. Uses the repo's quaternion kernels
  for the rotational part.

Everything is fixed-shape jnp and jit/vmap-safe: evaluating the
B-instance Monte-Carlo ensemble is `jax.vmap(ate_rmse)(est, gt)` — one
XLA program, no per-instance host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ekf_slam_tpu.ops.quaternion import q2r, qconj, qprod


def umeyama(src: jnp.ndarray, dst: jnp.ndarray,
            with_scale: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]:
    """Least-squares (s, R, t) with  dst ≈ s · R @ src + t.

    src, dst: (T, 3) point sets (trajectory positions). with_scale=False
    returns s=1 (SE(3) alignment); True estimates Sim(3) scale (the
    monocular case). Umeyama (1991) eq. 34-43, with the det-sign fix so
    R is a proper rotation even for degenerate/reflected constellations.
    """
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]                      # (3, 3)
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], src.dtype).at[2].mul(d))
    R = U @ D @ Vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(sc * sc, axis=-1))
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.ones((), src.dtype)
    t = mu_d - s * R @ mu_s
    return s, R, t


def align(src: jnp.ndarray, dst: jnp.ndarray,
          with_scale: bool = False) -> jnp.ndarray:
    """Return src mapped onto dst's frame by the Umeyama transform."""
    s, R, t = umeyama(src, dst, with_scale)
    return s * src @ R.T + t


def ate_rmse(est: jnp.ndarray, gt: jnp.ndarray, do_align: bool = True,
             with_scale: bool = False) -> jnp.ndarray:
    """Absolute trajectory error (RMSE over positions) after removing
    the gauge. est, gt: (T, 3)."""
    aligned = align(est, gt, with_scale) if do_align else est
    return jnp.sqrt(jnp.mean(jnp.sum((aligned - gt) ** 2, axis=-1)))


def _rel_pose(r0, q0, r1, q1):
    """Pose 0⁻¹ ∘ pose 1: (Δr in frame 0, Δq). Poses are world-frame
    (position r, world-from-body quaternion q) — the filter state layout
    (filter/state.py: x[0:3]=r, x[3:7]=q)."""
    R0 = q2r(q0)
    dr = R0.T @ (r1 - r0)
    dq = qprod(qconj(q0), q1)
    return dr, dq


def rpe(est_r: jnp.ndarray, est_q: jnp.ndarray,
        gt_r: jnp.ndarray, gt_q: jnp.ndarray,
        delta: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relative pose error over horizon `delta` frames.

    est_r/gt_r: (T, 3) positions; est_q/gt_q: (T, 4) quaternions.
    Returns (trans_rmse, rot_rmse_rad): RMS of the translational and
    rotational magnitude of (gt_rel⁻¹ ∘ est_rel) over the T-delta
    windows. `delta` is static (fixed-shape slices).
    """
    rel = jax.vmap(_rel_pose)
    e_dr, e_dq = rel(est_r[:-delta], est_q[:-delta],
                     est_r[delta:], est_q[delta:])
    g_dr, g_dq = rel(gt_r[:-delta], gt_q[:-delta],
                     gt_r[delta:], gt_q[delta:])
    # Error motion: gt_rel⁻¹ ∘ est_rel.
    err_r = jax.vmap(lambda gq, gr, er: q2r(gq).T @ (er - gr))(
        g_dq, g_dr, e_dr)
    err_q = jax.vmap(lambda gq, eq: qprod(qconj(gq), eq))(g_dq, e_dq)
    trans = jnp.sqrt(jnp.mean(jnp.sum(err_r ** 2, axis=-1)))
    # Rotation angle: 2·atan2(‖vec‖, |w|) — numerically stable near 0.
    ang = 2.0 * jnp.arctan2(jnp.linalg.norm(err_q[:, 1:], axis=-1),
                            jnp.abs(err_q[:, 0]))
    rot = jnp.sqrt(jnp.mean(ang ** 2))
    return trans, rot


def evaluate_trajectory(traj: jnp.ndarray, gt: jnp.ndarray,
                        delta: int = 1, with_scale: bool = False) -> dict:
    """One-call summary for a filter trajectory vs ground truth.

    traj, gt: (T, >=7) state rows laid out like the filter camera state
    (x[0:3]=r, x[3:7]=q — filter/state.py); extra columns are ignored.
    Returns {ate, rpe_trans, rpe_rot}. vmap over a leading batch axis
    for the Monte-Carlo ensemble.
    """
    ate = ate_rmse(traj[:, 0:3], gt[:, 0:3], with_scale=with_scale)
    tr, ro = rpe(traj[:, 0:3], traj[:, 3:7], gt[:, 0:3], gt[:, 3:7],
                 delta=delta)
    return {"ate": ate, "rpe_trans": tr, "rpe_rot": ro}
