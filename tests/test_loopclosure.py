"""Keypoint, retrieval, geometric-verification and loop-fusion tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EngineConfig
from ekf_slam_tpu.filter import loop_fusion
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.models import keypoints as kp_mod
from ekf_slam_tpu.models import loopclosure as lc


def test_kp_descriptor_shapes_and_peaks():
    B, H, W, C = 2, 16, 16, 6
    img = jax.random.normal(jax.random.key(0), (B, H, W, C))
    # Plant a dominant peak for channel 0 in the top-left cell.
    img = img.at[0, 2, 3, 0].set(100.0)
    kps = kp_mod.kp_descriptor(img)
    K = kp_mod.GRID * kp_mod.GRID * C
    assert kps.yx.shape == (B, K, 2)
    assert kps.descr.shape == (B, K, 8 * C)
    # Keypoint 0 of image 0 (cell 0, channel 0) is the planted peak.
    assert tuple(np.asarray(kps.yx[0, 0]).astype(int)) == (2, 3)
    assert float(kps.response[0, 0]) == 100.0


def test_ratio_test_identifies_matches():
    d = jax.random.normal(jax.random.key(1), (10, 8))
    idx, valid = kp_mod.ratio_test_matches(d, d, ratio=0.7)
    # Self-matching: every point matches itself with distance ~0.
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
    assert bool(jnp.all(valid))


def test_fundamental_ransac_planar_shift():
    """Points displaced by a pure translation admit a consistent epipolar
    geometry; random correspondences do not."""
    cfg = lc.LoopConfig(ransac_hypotheses=32, ransac_threshold=1.0)
    key = jax.random.key(2)
    pts1 = jax.random.uniform(key, (64, 2)) * 100.0
    pts2 = pts1 + jnp.array([3.0, 0.0])
    valid = jnp.ones(64, bool)
    inl = lc.fundamental_ransac(pts1, pts2, valid, cfg, jax.random.key(3))
    assert int(inl) >= 50
    pts2_rand = jax.random.uniform(jax.random.key(4), (64, 2)) * 100.0
    inl_rand = lc.fundamental_ransac(pts1, pts2_rand, valid, cfg,
                                     jax.random.key(5))
    assert int(inl_rand) < int(inl)


def _push_frames(db, descrs, kps, poses):
    for i in range(descrs.shape[0]):
        db = lc.push(db, descrs[i], jax.tree.map(lambda a: a[i], kps),
                     poses[i])
    return db


def test_loop_retrieval_end_to_end():
    """A revisited place (same descriptor + keypoints) must be retrieved and
    pass geometric verification; temporal filter fires after C hits."""
    cfg = lc.LoopConfig(capacity=64, top_k=4, exclude_recent=8, min_db=0,
                        sim_threshold=0.8, min_inliers=10,
                        consistency_count=3, consistency_window=2,
                        ransac_hypotheses=16)
    Dd, K, Dk = 32, 24, 16
    db = lc.init_db(cfg, Dd, K, Dk)
    key = jax.random.key(6)
    descrs = jax.random.normal(key, (20, Dd))
    descrs = descrs / jnp.linalg.norm(descrs, axis=-1, keepdims=True)
    kp_yx = jax.random.uniform(jax.random.key(7), (20, K, 2)) * 60.0
    kp_d = jax.random.normal(jax.random.key(8), (20, K, Dk))
    kps = kp_mod.Keypoints(yx=kp_yx, response=jnp.ones((20, K)),
                           orientation=jnp.zeros((20, K)), descr=kp_d)
    poses = jnp.concatenate(
        [jax.random.normal(jax.random.key(9), (20, 3)),
         jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (20, 1))], axis=-1)
    db = _push_frames(db, descrs, kps, poses)

    # Query with frame 2's content (revisit): keypoints shifted by 1 px.
    q_kp = kp_mod.Keypoints(
        yx=kp_yx[2] + 1.0, response=jnp.ones(K),
        orientation=jnp.zeros(K), descr=kp_d[2])
    declared = False
    for t in range(4):
        res = lc.query(db, descrs[2], q_kp, cfg, jax.random.key(20 + t))
        assert int(res.best_id) == 2
        assert bool(res.is_hypothesis)
        db, d, loop_slot, loop_frame = lc.step_temporal(db, res, cfg)
        declared = declared or bool(d)
    assert declared
    assert int(loop_slot) == 2
    assert int(loop_frame) == 2


def test_ring_wrap_excludes_recent_and_keeps_frame_ids():
    """After the ring wraps, the newest frames sit in the LOWEST slots; the
    recency exclusion and the returned ids must follow absolute frame
    indices, not slot order (advisor finding r1)."""
    cfg = lc.LoopConfig(capacity=8, top_k=2, exclude_recent=3, min_db=0,
                        sim_threshold=0.5, min_inliers=0,
                        ransac_hypotheses=4)
    Dd, K, Dk = 8, 12, 4
    db = lc.init_db(cfg, Dd, K, Dk)
    n_frames = 11  # wraps: frames 8, 9, 10 land in slots 0, 1, 2
    descrs = jax.random.normal(jax.random.key(30), (n_frames, Dd))
    descrs = descrs / jnp.linalg.norm(descrs, axis=-1, keepdims=True)
    kps = kp_mod.Keypoints(
        yx=jax.random.uniform(jax.random.key(31), (n_frames, K, 2)) * 40.0,
        response=jnp.ones((n_frames, K)),
        orientation=jnp.zeros((n_frames, K)),
        descr=jax.random.normal(jax.random.key(32), (n_frames, K, Dk)))
    poses = jnp.zeros((n_frames, 7)).at[:, 3].set(1.0)
    db = _push_frames(db, descrs, kps, poses)
    assert int(db.count) == n_frames
    # Slot 1 now holds frame 9 (not frame 1).
    assert int(db.frame_id[1]) == 9

    # Query with the most recent frame's own content: frames 8/9/10 are
    # within exclude_recent=3 and must NOT be retrievable even though they
    # occupy the oldest-looking slots 0-2.
    q_kp = jax.tree.map(lambda a: a[10], kps)
    res = lc.query(db, descrs[10], q_kp, cfg, jax.random.key(33))
    retrieved_frames = np.asarray(db.frame_id)[np.asarray(res.candidate_ids)]
    assert all(f <= n_frames - 1 - cfg.exclude_recent
               for f in retrieved_frames)
    # Query with frame 7's content (slot 7, still valid): best must map back
    # to absolute frame 7 through the slot indirection.
    q_kp7 = jax.tree.map(lambda a: a[7], kps)
    res7 = lc.query(db, descrs[7], q_kp7, cfg, jax.random.key(34))
    assert int(res7.best_id) == 7
    assert int(res7.best_slot) == 7 % cfg.capacity


def test_pose_constraint_pulls_position_and_orientation():
    """6-DoF loop constraint: both position and orientation move toward the
    stored frame pose; disabled is a no-op; more inliers -> tighter."""
    from ekf_slam_tpu.ops import quaternion as quat
    cfg = EngineConfig()
    st = init_state(cfg)
    # Perturbed current pose, uncertain in position AND orientation.
    q0 = jnp.array([0.9961947, 0.0, 0.08715574, 0.0],
                   jnp.float32)  # 10 deg about y
    x = st.x.at[0:3].set(jnp.array([0.4, -0.1, 0.2], st.x.dtype)) \
        .at[3:7].set(q0)
    P = st.P.at[0:3, 0:3].set(jnp.eye(3, dtype=st.P.dtype) * 1.0)
    P = P.at[3:7, 3:7].set(jnp.eye(4, dtype=st.P.dtype) * 0.05)
    pose_j = jnp.zeros(7, st.x.dtype).at[3].set(1.0)     # identity pose

    x2, P2 = loop_fusion.apply_loop_constraint_pose(
        x, P, pose_j, 0.01, 0.01, jnp.asarray(True))
    assert float(jnp.linalg.norm(x2[0:3])) < 0.05        # pulled to origin
    q2 = x2[3:7] / jnp.linalg.norm(x2[3:7])
    ang = 2 * jnp.arccos(jnp.clip(jnp.abs(q2[0]), 0, 1))
    assert float(ang) < jnp.deg2rad(2.0)                 # orientation too
    # Disabled: no-op on the mean.
    x3, _ = loop_fusion.apply_loop_constraint_pose(
        x, P, pose_j, 0.01, 0.01, jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), atol=1e-6)
    # Hemisphere safety: -q_j is the same rotation.
    x4, _ = loop_fusion.apply_loop_constraint_pose(
        x, P, pose_j.at[3:7].set(jnp.array([-1.0, 0, 0, 0], pose_j.dtype)),
        0.01, 0.01, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(x4), np.asarray(x2), atol=1e-5)
    # Noise scaling: inliers tighten the constraint monotonically.
    sp_lo, sr_lo = loop_fusion.loop_noise_sigmas(jnp.asarray(8))
    sp_hi, sr_hi = loop_fusion.loop_noise_sigmas(jnp.asarray(64))
    assert float(sp_hi) < float(sp_lo) and float(sr_hi) < float(sr_lo)
    # Masked update against an EMPTY db slot (all-zero pose, zero
    # quaternion) must stay finite AND a no-op — the branchless
    # loop_runner path evaluates this every frame before the first loop.
    x5, P5 = loop_fusion.apply_loop_constraint_pose(
        x, P, jnp.zeros(7, st.x.dtype), 0.01, 0.01, jnp.asarray(False))
    assert bool(jnp.isfinite(x5).all() & jnp.isfinite(P5).all())
    np.testing.assert_allclose(np.asarray(x5), np.asarray(x), atol=1e-6)


def test_loop_constraint_reduces_drift_in_engine():
    """Out-and-back in-engine: accumulate real filter drift, then fuse a
    declared loop (constraint = the pose stored when the start was first
    visited) and check trajectory error drops — the end-to-end effect the
    reference's emitted kitti_loops.txt was FOR (close_kitti_loops.py:
    141-143)."""
    from ekf_slam_tpu.config import MapConfig, SimConfig
    from ekf_slam_tpu.filter import engine
    from ekf_slam_tpu.sim import simulate
    cfg = EngineConfig(
        map=MapConfig(capacity=24, min_features_in_image=10,
                      max_new_per_step=8),
        sim=SimConfig(num_landmarks=32, pixel_noise_std=2.0,
                      outlier_fraction=0.2),
        dtype="float64")
    T = 10
    scn, xs, obs = simulate(jax.random.key(11), cfg, T)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    stored_pose = jnp.concatenate([xs[0][0:3], xs[0][3:7]])  # frame-0 pose
    for t in range(1, T):
        st, _ = engine.step(st, jax.tree.map(lambda a: a[t], obs),
                            jax.random.key(50 + t), cfg)
    # Pretend the loop detector matched the current frame to frame 0's
    # NEIGHBORHOOD: constraint pose = true pose at the revisited place
    # (here: the current true pose, as a verified match supplies).
    pose_now = jnp.concatenate([xs[T - 1][0:3], xs[T - 1][3:7]])
    err_before = float(jnp.linalg.norm(st.x[0:3] - xs[T - 1][0:3]))
    sp, sr = loop_fusion.loop_noise_sigmas(jnp.asarray(40))
    x2, P2 = loop_fusion.apply_loop_constraint_pose(
        st.x, st.P, pose_now, sp, sr, jnp.asarray(True))
    err_after = float(jnp.linalg.norm(x2[0:3] - xs[T - 1][0:3]))
    assert err_after < err_before
    # Covariance must contract (trace of the pose block).
    assert float(jnp.trace(P2[0:7, 0:7])) < float(jnp.trace(st.P[0:7, 0:7]))


def test_loop_constraint_pulls_position():
    cfg = EngineConfig()
    st = init_state(cfg)
    P = st.P.at[0:3, 0:3].set(jnp.eye(3, dtype=st.P.dtype))  # uncertain pos
    z = jnp.array([0.5, -0.2, 0.1], st.x.dtype)
    x_new, P_new = loop_fusion.apply_loop_constraint(
        st.x, P, z, sigma=0.01, enabled=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(x_new[0:3]), np.asarray(z),
                               atol=1e-3)
    # Disabled: no-op on the mean.
    x_same, _ = loop_fusion.apply_loop_constraint(
        st.x, P, z, sigma=0.01, enabled=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(x_same[0:3]),
                               np.asarray(st.x[0:3]), atol=1e-6)
