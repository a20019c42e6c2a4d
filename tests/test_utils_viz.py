"""Metrics logger, numerics guards, and viz smoke tests."""

import os

import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.utils import MetricsLogger, check_finite
from ekf_slam_tpu.viz import (plot_frame, plot_map_3d,
                              uncertainty_ellipse_points)


def test_check_finite():
    _, ok = check_finite(jnp.ones(3))
    assert bool(ok)
    _, bad = check_finite(jnp.array([1.0, jnp.nan]))
    assert not bool(bad)


def test_metrics_logger_roundtrip(tmp_path):
    ml = MetricsLogger()
    ml.log(0, loss=1.5, n_ic=20)
    ml.log(1, loss=1.2, n_ic=22)
    assert ml.series("loss") == [1.5, 1.2]
    assert "loss" in ml.table()
    p = str(tmp_path / "m.jsonl")
    ml.dump_jsonl(p)
    assert os.path.getsize(p) > 0


def test_uncertainty_ellipse_radius():
    S = np.diag([4.0, 1.0])
    # n=33 -> angle grid includes pi/2 so both semi-axes are sampled exactly
    pts = uncertainty_ellipse_points(S, np.zeros(2), n=33)
    # Extent along x = sqrt(chi2 * 4), along y = sqrt(chi2).
    assert abs(pts[0].max() - np.sqrt(5.9915 * 4)) < 1e-6
    assert abs(pts[1].max() - np.sqrt(5.9915)) < 1e-6


def test_plot_functions_smoke(tmp_path):
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("matplotlib not installed")
    n = 6
    h = np.random.rand(n, 2) * 100
    S = np.tile(np.eye(2) * 4, (n, 1, 1))
    vis = np.ones(n, bool)
    ic = np.array([1, 1, 1, 1, 0, 0], bool)
    li = np.array([1, 1, 0, 0, 0, 0], bool)
    hi = np.array([0, 0, 1, 0, 0, 0], bool)
    img = np.random.rand(120, 160)
    p1 = str(tmp_path / "frame.png")
    plot_frame(p1, img, h, S, vis, ic, li, hi)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "map.png")
    traj = np.cumsum(np.random.randn(20, 3) * 0.01, axis=0)
    lms = np.random.randn(10, 3)
    cov = np.tile(np.eye(3) * 0.01, (10, 1, 1))
    plot_map_3d(p2, traj, lms, cov, active=np.ones(10, bool),
                truth_traj=traj + 0.01)
    assert os.path.getsize(p2) > 0


def test_save_animation_gif(tmp_path):
    from ekf_slam_tpu.viz.animation import save_animation
    frames = [np.random.rand(16, 20) for _ in range(4)]
    p = str(tmp_path / "anim.gif")
    n = save_animation(p, frames, fps=5)
    assert n == 4
    assert os.path.getsize(p) > 0
    from PIL import Image
    im = Image.open(p)
    assert im.n_frames == 4


def test_coco_adapter_gated():
    import pytest
    from ekf_slam_tpu.data import coco as coco_mod
    try:
        import pycocotools  # noqa: F401
        pytest.skip("pycocotools present; gate not exercised")
    except ImportError:
        with pytest.raises(ImportError, match="pycocotools"):
            coco_mod._require_pycocotools()
