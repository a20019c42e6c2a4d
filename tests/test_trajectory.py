"""Trajectory-metrics tests: Umeyama recovery, ATE gauge removal, RPE
invariances, batched (vmap) evaluation — utils/trajectory.py."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.ops.quaternion import qprod, rpy2r, r2q
from ekf_slam_tpu.utils import trajectory as tj


def _traj(key, T=40):
    steps = 0.1 * jax.random.normal(key, (T, 3))
    return jnp.cumsum(steps, axis=0)


def test_umeyama_recovers_rigid_transform():
    src = _traj(jax.random.key(0))
    R_true = rpy2r(0.3, -0.2, 0.7)
    t_true = jnp.array([1.0, -2.0, 0.5])
    dst = src @ R_true.T + t_true
    s, R, t = tj.umeyama(src, dst)
    np.testing.assert_allclose(float(s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)
    assert float(tj.ate_rmse(src, dst)) < 1e-5


def test_umeyama_scale():
    src = _traj(jax.random.key(1))
    dst = 2.5 * src @ rpy2r(0.1, 0.2, 0.3).T + jnp.array([0.0, 1.0, 0.0])
    s, R, t = tj.umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(float(s), 2.5, rtol=1e-5)
    # SE(3)-only alignment cannot explain the scale; Sim(3) can.
    assert float(tj.ate_rmse(src, dst)) > 0.1
    assert float(tj.ate_rmse(src, dst, with_scale=True)) < 1e-5


def test_ate_requires_alignment():
    src = _traj(jax.random.key(2))
    dst = src + jnp.array([3.0, 0.0, 0.0])
    assert float(tj.ate_rmse(src, dst, do_align=False)) > 2.9
    assert float(tj.ate_rmse(src, dst)) < 1e-6


def _poses(key, T=30):
    r = _traj(key, T)
    keys = jax.random.split(jax.random.key(7), T)
    angs = 0.05 * jnp.cumsum(
        jax.random.normal(jax.random.key(8), (T, 3)), axis=0)
    q = jnp.stack([r2q(rpy2r(*a)) for a in angs])
    del keys
    return r, q


def test_rpe_zero_on_identical_and_offset_invariant():
    r, q = _poses(jax.random.key(3))
    tr, ro = tj.rpe(r, q, r, q)
    assert float(tr) < 1e-6 and float(ro) < 1e-6
    # A constant world-frame offset changes ATE(no-align) but not RPE:
    # relative motion is offset-invariant.
    tr2, ro2 = tj.rpe(r + jnp.array([5.0, 0, 0]), q, r, q)
    assert float(tr2) < 1e-6 and float(ro2) < 1e-6


def test_rpe_detects_rotation_drift():
    """Identity ground-truth attitude, estimated attitude accumulating
    0.02 rad yaw per frame: the per-window rotational RPE is exactly
    0.02·delta (no gt rotation to conjugate the drift axis through)."""
    T = 30
    r = _traj(jax.random.key(4), T)
    q_id = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), (T, 4))
    q_drift = jnp.stack([r2q(rpy2r(0.0, 0.0, 0.02 * i)) for i in range(T)])
    _, ro = tj.rpe(r, q_drift, r, q_id, delta=1)
    np.testing.assert_allclose(float(ro), 0.02, rtol=1e-3)
    _, ro5 = tj.rpe(r, q_drift, r, q_id, delta=5)
    np.testing.assert_allclose(float(ro5), 0.1, rtol=1e-3)
    # With a mixed random gt attitude the drift still registers at the
    # same order (conjugation preserves rotation angle per window, the
    # windows just compose on rotated axes).
    _, q = _poses(jax.random.key(4))
    q_d2 = jnp.stack([qprod(qi, r2q(rpy2r(0.0, 0.0, 0.02 * i)))
                      for i, qi in enumerate(q)])
    _, ro_mixed = tj.rpe(r, q_d2, r, q, delta=1)
    assert 0.01 < float(ro_mixed) < 0.08


def test_evaluate_trajectory_batched():
    r, q = _poses(jax.random.key(5))
    gt = jnp.concatenate([r, q], axis=-1)
    est = jnp.stack([gt, gt.at[:, 0].add(0.01)])      # batch of 2
    out = jax.vmap(lambda e: tj.evaluate_trajectory(e, gt))(est)
    assert out["ate"].shape == (2,)
    assert float(out["ate"][0]) < 1e-6
    assert float(out["rpe_rot"][1]) < 1e-6            # position-only noise
    assert np.all(np.isfinite(np.asarray(out["rpe_trans"])))


def test_jit_and_fixed_shape():
    r, q = _poses(jax.random.key(6))
    gt = jnp.concatenate([r, q], axis=-1)
    f = jax.jit(lambda e: tj.evaluate_trajectory(e, gt))
    out = f(gt)
    assert float(out["ate"]) < 1e-6
