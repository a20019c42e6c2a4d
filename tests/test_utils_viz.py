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


def test_uncertain_surface_xz_hull():
    from ekf_slam_tpu.viz import uncertain_surface_xz_hull
    # Feature straight ahead (theta=phi=0, rho=0.5 -> depth 2 on +z) with
    # small uncertainty: the hull must be a closed polygon around (0, 2).
    y6 = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.5])
    C6 = np.diag([1e-4] * 3 + [1e-4, 1e-4, 1e-3])
    poly = uncertain_surface_xz_hull(C6, y6, n=500)
    assert poly is not None and poly.shape[1] == 2
    assert np.allclose(poly[0], poly[-1])            # closed
    cx, cz = poly[:-1].mean(axis=0)
    assert abs(cx) < 0.1 and abs(cz - 2.0) < 0.3
    # Hull contains the nominal point (convexity check via support test).
    assert (poly[:, 1].min() < 2.0 < poly[:, 1].max())
    # rho mostly negative -> too few samples -> None (reference's >10 rule).
    y6_bad = np.array([0, 0, 0, 0, 0, -50.0])
    assert uncertain_surface_xz_hull(C6, y6_bad, n=500) is None


def test_crosscorr_and_svd_variant():
    import jax.numpy as jnp
    from ekf_slam_tpu.vision.ncc import crosscorr, crosscorr_svd
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((7, 7)), jnp.float32)
    # Identical patches: both scores == 1.
    assert abs(float(crosscorr(a, a)) - 1.0) < 1e-5
    assert abs(float(crosscorr_svd(a, a)) - 1.0) < 1e-4
    # SVD variant is rotation-invariant (crosscorr.m:29-42): a 90° rotation
    # keeps the singular values, so the score stays 1 while plain NCC drops.
    a90 = jnp.rot90(a)
    assert abs(float(crosscorr_svd(a, a90)) - 1.0) < 1e-4
    assert float(crosscorr(a, a90)) < 0.9
    # Flat patch -> den == 0 -> score 0 (reference's (den~=0) guard). For
    # the SVD variant the guard needs a constant *spectrum*: zeros.
    flat = jnp.ones((7, 7), jnp.float32)
    assert float(crosscorr(flat, a)) == 0.0
    assert float(crosscorr_svd(jnp.zeros((7, 7)), jnp.zeros((7, 7)))) == 0.0
    # svd= flag routes (crosscorr.m nargin==3 mode) and batching works.
    b = jnp.asarray(rng.random((4, 7, 7)), jnp.float32)
    assert crosscorr(b, b, svd=True).shape == (4,)


def test_plot_frame_with_measurements_and_patches(tmp_path):
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("matplotlib not installed")
    n = 4
    h = np.random.rand(n, 2) * 100 + 10
    S = np.tile(np.eye(2) * 4, (n, 1, 1))
    vis = np.ones(n, bool)
    ic = np.array([1, 1, 0, 0], bool)
    li = np.array([1, 0, 0, 0], bool)
    hi = np.array([0, 1, 0, 0], bool)
    z = h + np.random.randn(n, 2)
    patches = np.random.rand(n, 13, 13)
    p = str(tmp_path / "frame_full.png")
    plot_frame(p, np.random.rand(120, 160), h, S, vis, ic, li, hi,
               z=z, patches=patches)
    assert os.path.getsize(p) > 0


def test_save_video_fallback_or_mp4(tmp_path):
    import shutil
    from ekf_slam_tpu.viz.animation import save_video
    frames = [np.random.rand(16, 20) for _ in range(3)]
    p = str(tmp_path / "out.mp4")
    n = save_video(p, frames, fps=5)
    assert n == 3
    if shutil.which("ffmpeg"):
        assert os.path.getsize(p) > 0
    else:  # GIF fallback written next to the requested path
        assert os.path.getsize(str(tmp_path / "out.gif")) > 0


def test_video_sequence_requires_ffmpeg(tmp_path):
    import shutil
    import pytest
    from ekf_slam_tpu.io.sequence import VideoSequence
    if shutil.which("ffmpeg") and shutil.which("ffprobe"):
        # Round-trip: encode 4 gray frames, decode, compare.
        from ekf_slam_tpu.viz.animation import save_video
        frames = [np.full((16, 20), v, np.float32)
                  for v in (0.1, 0.4, 0.7, 0.9)]
        p = str(tmp_path / "clip.mp4")
        save_video(p, frames, fps=5)
        vs = VideoSequence(p)
        got = vs.load(0, len(vs))
        assert got.shape[1:] == (16, 20)
        assert abs(float(got[0].mean()) - 0.1) < 0.08
    else:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            VideoSequence(str(tmp_path / "missing.mp4"))


def test_coco_adapter_backend_fallback():
    """The adapter no longer hard-gates on pycocotools: without it the
    bundled pure-Python MiniCOCO (data/coco_min.py, written from the
    COCO/RLE spec) is selected so the gen_tfrecords analog stays
    executable in this image."""
    import pytest
    from ekf_slam_tpu.data import coco as coco_mod
    try:
        import pycocotools  # noqa: F401
        pytest.skip("pycocotools present; fallback not exercised")
    except ImportError:
        from ekf_slam_tpu.data.coco_min import MiniCOCO
        assert coco_mod._coco_backend() is MiniCOCO


def test_local_descriptor_projections_and_plot(tmp_path):
    """show_local_descr analog (test_net.py:383-478): PCA-projected local
    descriptor directions are unit vectors; identical database/positive
    images align exactly; the plot writes a PNG."""
    import jax
    from ekf_slam_tpu.models import train
    from ekf_slam_tpu.models.vss import VSSConfig
    from ekf_slam_tpu.viz.descriptors import (LinearPCA,
                                              local_descriptor_projections,
                                              plot_local_descriptors)

    model = train.create_model(VSSConfig(width=8))
    tcfg = train.TrainConfig(batch_size=2, image_hw=(32, 32))
    state = train.init_state(model, tcfg, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    rng = np.random.default_rng(0)
    train_ims = rng.random((5, 32, 32, 3), np.float32)
    db = rng.random((32, 32, 3), np.float32)
    neg = rng.random((32, 32, 3), np.float32)
    triplet = np.stack([db, db, neg])  # positive == database exactly

    proj = local_descriptor_projections(model, variables, triplet,
                                        train_ims)
    assert set(proj) == {"appearance", "building", "vegetation"}
    for v in proj.values():
        assert v.shape == (3, 2)
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0,
                                   rtol=1e-6)
        # database and positive are the same image -> same direction
        np.testing.assert_allclose(v[0], v[1], atol=1e-9)

    out = plot_local_descriptors(proj, str(tmp_path / "descr.png"),
                                 order=["building", "vegetation",
                                        "appearance"])
    assert os.path.exists(out) and os.path.getsize(out) > 0

    # LinearPCA == classic PCA: projections reproduce centered data in the
    # top-2 subspace for rank-2 data.
    X = rng.random((6, 2), np.float64) @ np.array([[1.0, 0.5, 0.0],
                                                   [0.0, 1.0, 2.0]])
    p = LinearPCA(2).fit(X)
    Y = p.transform(X)
    Xr = Y @ p.components + p.mean
    np.testing.assert_allclose(Xr, X, atol=1e-9)
