"""Native + fallback image-sequence loader tests (takeImage.m parity)."""

import numpy as np
import pytest

from ekf_slam_tpu.io import (ImageSequence, build_native, load_pgm,
                             native_available, write_pgm, write_ppm)
from ekf_slam_tpu.io.sequence import _load_pgm_numpy


def write_pgm_commented(path, arr, maxval=255):
    """P5 with a '#' header comment (both loaders must skip comments)."""
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n# test comment\n{w} {h}\n{maxval}\n".encode())
        f.write(arr.astype(np.uint8).tobytes())


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (5, 24, 32), dtype=np.uint8)
    for i, fr in enumerate(frames):
        # first frame carries a header comment, rest use the library writer
        if i == 0:
            write_pgm_commented(str(d / f"{i:04d}.pgm"), fr)
        else:
            write_pgm(str(d / f"{i:04d}.pgm"), fr)
    return d, frames


def test_numpy_fallback_pgm(seq_dir):
    d, frames = seq_dir
    got = _load_pgm_numpy(str(d / "0000.pgm"))
    np.testing.assert_allclose(got, frames[0] / 255.0, atol=1e-7)


def test_ascii_pgm(tmp_path):
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    write_pgm(str(tmp_path / "a.pgm"), arr, binary=False)
    got = _load_pgm_numpy(str(tmp_path / "a.pgm"))
    np.testing.assert_allclose(got, arr / 255.0, atol=1e-7)


def test_native_builds_and_matches(seq_dir):
    d, frames = seq_dir
    if not build_native():
        pytest.skip("g++ unavailable")
    assert native_available()
    got = load_pgm(str(d / "0002.pgm"))
    np.testing.assert_allclose(got, frames[2] / 255.0, atol=1e-7)


def test_sequence_batch_native(seq_dir):
    d, frames = seq_dir
    if not build_native():
        pytest.skip("g++ unavailable")
    seq = ImageSequence(str(d / "%04d.pgm"), start=0, count=5)
    assert (seq.height, seq.width) == (24, 32)
    batch = seq.load(1, 3)
    assert batch.shape == (3, 24, 32)
    np.testing.assert_allclose(batch, frames[1:4] / 255.0, atol=1e-7)
    seq.close()


def test_ppm_first_channel(tmp_path):
    rgb = np.random.default_rng(1).integers(0, 256, (6, 8, 3),
                                            dtype=np.uint8)
    write_ppm(str(tmp_path / "c.ppm"), rgb)
    got = _load_pgm_numpy(str(tmp_path / "c.ppm"))
    # takeImage.m keeps the first channel
    np.testing.assert_allclose(got, rgb[:, :, 0] / 255.0, atol=1e-7)


def test_kitti_pose_roundtrip(tmp_path):
    from ekf_slam_tpu.io.poses import (load_kitti_poses, poses_to_rq,
                                       save_trajectory_kitti)
    rng = np.random.default_rng(2)
    # random valid rotations via QR
    T = 5
    qs, _ = np.linalg.qr(rng.normal(size=(T, 3, 3)))
    dets = np.linalg.det(qs)
    qs = qs * dets[:, None, None]   # ensure det +1
    ts = rng.normal(size=(T, 3))
    poses = np.concatenate([qs, ts[:, :, None]], axis=2)
    p = str(tmp_path / "poses.txt")
    np.savetxt(p, poses.reshape(-1, 12))
    back = load_kitti_poses(p)
    np.testing.assert_allclose(back, poses, atol=1e-12)
    rq = poses_to_rq(back)
    assert rq.shape == (T, 7)
    np.testing.assert_allclose(np.linalg.norm(rq[:, 3:7], axis=1), 1.0,
                               atol=1e-6)
    out = str(tmp_path / "traj.txt")
    save_trajectory_kitti(out, rq)
    back2 = load_kitti_poses(out)
    np.testing.assert_allclose(back2[:, :, 3], ts, atol=1e-7)
    np.testing.assert_allclose(back2[:, :, 0:3], qs, atol=1e-5)


def test_video_sequence_via_ffmpeg_shims(tmp_path, monkeypatch):
    """VideoSequence decode/stream logic through fake ffmpeg/ffprobe
    shims (no codec stack in this environment): 3 gray 8x6 frames piped
    as rawvideo must come back shaped, scaled to [0,1] and in order."""
    import os
    import stat

    frames = np.stack([np.full((6, 8), v, np.uint8)
                       for v in (0, 128, 255)])
    raw = tmp_path / "raw.bin"
    raw.write_bytes(frames.tobytes())
    ffprobe = tmp_path / "ffprobe"
    ffprobe.write_text(
        "#!/bin/sh\n"
        "echo '{\"streams\": [{\"width\": 16, \"height\": 12, "
        "\"nb_frames\": 3}]}'\n")
    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(f"#!/bin/sh\ncat {raw}\n")
    for f in (ffprobe, ffmpeg):
        os.chmod(f, os.stat(f).st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    from ekf_slam_tpu.io.video import VideoSequence, load_video_frames
    seq = VideoSequence("fake.avi", half_size=True)
    assert (seq.width, seq.height) == (8, 6)     # 16x12 half-sized
    assert len(seq) == 3
    np.testing.assert_allclose(seq[1], np.full((6, 8), 128 / 255.0),
                               atol=1e-6)
    stack = load_video_frames("fake.avi", count=2)
    assert stack.shape == (2, 6, 8)
    assert stack[0].max() == 0.0 and abs(stack[1].max() - 128 / 255) < 1e-6


def test_video_sequence_clear_error_without_ffmpeg(monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    from ekf_slam_tpu.io.video import VideoSequence
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="ffmpeg"):
        VideoSequence("x.avi")
