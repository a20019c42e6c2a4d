"""Compact gathered update == full-width masked update (exact)."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EngineConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import scene as sim_scene


def test_step_compact_equals_full():
    base = dict(capacity=32, min_features_in_image=12, max_new_per_step=12)
    cfg_full = EngineConfig(
        map=MapConfig(max_update_obs=0, **base),
        sim=SimConfig(num_landmarks=48), dtype="float64")
    cfg_cmp = EngineConfig(
        map=MapConfig(max_update_obs=16, **base),
        sim=SimConfig(num_landmarks=48), dtype="float64")

    scn, xs, obs = sim_scene.simulate(jax.random.key(0), cfg_full, 6)
    st = engine.bootstrap(init_state(cfg_full),
                          jax.tree.map(lambda a: a[0], obs), cfg_full)

    runf = jax.jit(engine.run_sequence, static_argnames="cfg")
    f_final, f_traj, f_info = runf(st, obs, jax.random.key(1), cfg_full)
    c_final, c_traj, c_info = runf(st, obs, jax.random.key(1), cfg_cmp)

    # Same RANSAC key -> same inlier sets; 12 tracked features < 16 = M, so
    # the gathered update touches the same rows and must agree exactly.
    np.testing.assert_array_equal(np.asarray(f_info.n_li),
                                  np.asarray(c_info.n_li))
    np.testing.assert_allclose(np.asarray(f_traj), np.asarray(c_traj),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(f_final.P),
                               np.asarray(c_final.P), atol=1e-8)


def test_iterated_engine_step_runs_and_tracks():
    """IEKF-mode engine (configs[3] ekf_update_iterated path) stays finite
    and tracks on the sim sequence."""
    import dataclasses
    from ekf_slam_tpu.config import FilterConfig
    cfg = EngineConfig(
        filter=FilterConfig(use_iterated_update=True, iekf_iterations=2),
        map=MapConfig(capacity=32, min_features_in_image=12,
                      max_new_per_step=12, max_update_obs=16),
        sim=SimConfig(num_landmarks=48), dtype="float64")
    scn, xs, obs = sim_scene.simulate(jax.random.key(2), cfg, 6)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    run = jax.jit(engine.run_sequence, static_argnames="cfg")
    final, traj, info = run(st, obs, jax.random.key(3), cfg)
    assert bool(jnp.all(jnp.isfinite(final.x)))
    assert int(info.n_li[-1]) >= 5


def test_newton_gain_matches_cholesky():
    """Newton-Schulz S^-1 tracks the Cholesky gain to float32 accuracy over
    a full engine run (same RANSAC key -> same inlier sets)."""
    from ekf_slam_tpu.config import FilterConfig
    base = dict(capacity=32, min_features_in_image=12, max_new_per_step=12,
                max_update_obs=16)
    cfg_c = EngineConfig(map=MapConfig(**base),
                         sim=SimConfig(num_landmarks=48))
    cfg_n = EngineConfig(filter=FilterConfig(gain_solver="newton"),
                         map=MapConfig(**base),
                         sim=SimConfig(num_landmarks=48))
    scn, xs, obs = sim_scene.simulate(jax.random.key(4), cfg_c, 8)
    st = engine.bootstrap(init_state(cfg_c),
                          jax.tree.map(lambda a: a[0], obs), cfg_c)
    run = jax.jit(engine.run_sequence, static_argnames="cfg")
    _, traj_c, info_c = run(st, obs, jax.random.key(5), cfg_c)
    _, traj_n, info_n = run(st, obs, jax.random.key(5), cfg_n)
    np.testing.assert_array_equal(np.asarray(info_c.n_li),
                                  np.asarray(info_n.n_li))
    np.testing.assert_allclose(np.asarray(traj_c), np.asarray(traj_n),
                               atol=2e-4)
