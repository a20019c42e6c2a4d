"""Pose-file IO (KITTI odometry format).

The reference's online loop runner reads visual-odometry poses from a text
file of 12-float rows (row-major 3x4 [R|t]) and uses their (x, z) positions
for constraints ("CALC 2.0"/close_kitti_loops.py:78-86). Equivalents here:

* `load_kitti_poses(path)` -> (T, 3, 4) float64
* `poses_to_rq(poses)`     -> (T, 7) [r(3), q(4)] for the loop database
* `save_trajectory_kitti(path, traj)` — the kitti_traj.txt analog.
"""

from __future__ import annotations

import numpy as np


def load_kitti_poses(path: str) -> np.ndarray:
    data = np.loadtxt(path, dtype=np.float64)
    if data.ndim == 1:
        data = data[None]
    assert data.shape[1] == 12, f"expected 12 cols, got {data.shape[1]}"
    return data.reshape(-1, 3, 4)


def poses_to_rq(poses: np.ndarray) -> np.ndarray:
    """(T, 3, 4) [R|t] -> (T, 7) [t, q] using the engine's quaternion
    convention (w, x, y, z)."""
    import jax.numpy as jnp

    from ekf_slam_tpu.ops import quaternion as quat
    R = jnp.asarray(poses[:, :, 0:3])
    t = poses[:, :, 3]
    q = np.asarray(quat.r2q(R))
    return np.concatenate([t, q], axis=1)


def load_loops(path: str):
    """Parse a close_loops.py `kitti_loops.txt` into
    ((L,) i, (L,) j, (L, 7) pose_i, (L, 7) pose_j).

    Richer than the reference's rows (close_kitti_loops.py:144-150 keeps
    only the two endpoint positions): BOTH full [r, q] poses are stored,
    so each row can drive
    `filter/loop_fusion.apply_loop_constraint_pose` directly — the
    consumer side the reference never wrote. Empty file -> empty arrays.
    """
    if not np.fromfile(path, dtype=np.uint8).size:
        z = np.zeros(0)
        return (z.astype(int), z.astype(int), z.reshape(0, 7),
                z.reshape(0, 7))
    rows = np.loadtxt(path, dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None]
    assert rows.shape[1] == 16, f"expected 16 cols, got {rows.shape[1]}"
    return (rows[:, 0].astype(int), rows[:, 1].astype(int),
            rows[:, 2:9], rows[:, 9:16])


def save_trajectory_kitti(path: str, traj_rq: np.ndarray) -> None:
    """(T, >=7) [r(3) q(4) ...] -> KITTI 12-float rows."""
    import jax.numpy as jnp

    from ekf_slam_tpu.ops import quaternion as quat
    R = np.asarray(quat.q2r(jnp.asarray(traj_rq[:, 3:7])))
    t = traj_rq[:, 0:3]
    rows = np.concatenate([R.reshape(-1, 3, 3), t[:, :, None]], axis=2)
    np.savetxt(path, rows.reshape(-1, 12), fmt="%.9e")
