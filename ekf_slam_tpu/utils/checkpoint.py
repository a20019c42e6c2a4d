"""Checkpoint / resume for the filter and engine runs (SURVEY.md §5).

The reference checkpoints only the CALC2 estimator (utils.py:563-566);
the EKF keeps everything in memory (mono_slam.m:36). Here both are
first-class: FilterState (and any pytree — Appearance, LoopDatabase,
TrainState) saves/restores through orbax, and trajectories dump to .npz.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Orbax save of any pytree of arrays (absolute path required)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def dump_trajectory(path: str, traj, truth=None, infos=None) -> None:
    """npz trajectory dump (the reference keeps it in a workspace variable,
    plots.m:77; kitti_traj.txt analog)."""
    data = {"trajectory": np.asarray(traj)}
    if truth is not None:
        data["truth"] = np.asarray(truth)
    if infos is not None:
        data.update({f"info_{k}": np.asarray(v)
                     for k, v in infos._asdict().items()}
                    if hasattr(infos, "_asdict") else
                    {f"info_{k}": np.asarray(getattr(infos, k))
                     for k in ("n_visible", "n_ic", "n_li", "n_hi",
                               "ransac_support")})
    np.savez(path, **data)


def load_trajectory(path: str):
    return dict(np.load(path))
