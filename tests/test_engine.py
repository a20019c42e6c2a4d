"""End-to-end engine tests: synthetic scene → full SLAM step loop.

This is the modern form of what the reference never had (SURVEY.md §4): the
reference's only end-to-end validation was eyeballing plots (plots.m). Here
the synthetic scene gives ground truth, so tracking accuracy is asserted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import CAM_DIM, EngineConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import FilterState, init_state
from ekf_slam_tpu.sim import scene as sim_scene


def small_cfg(**sim_kw):
    return EngineConfig(
        map=MapConfig(capacity=48, min_features_in_image=20,
                      max_new_per_step=20),
        sim=SimConfig(num_landmarks=64, **sim_kw),
        dtype="float32")


def test_sim_shapes_and_visibility():
    cfg = small_cfg()
    scn, xs, obs = sim_scene.simulate(jax.random.key(0), cfg, 10)
    assert scn.landmarks.shape == (64, 3)
    assert xs.shape == (10, CAM_DIM)
    assert obs.pixels.shape == (10, 64, 2)
    # All landmarks are constructed inside the initial frustum.
    assert jnp.sum(obs.visible[0]) == 64


def test_e2e_smoke_and_consistency():
    cfg = small_cfg()
    key = jax.random.key(1)
    scn, xs, obs = sim_scene.simulate(key, cfg, 30)
    st = init_state(cfg)
    st = engine.bootstrap(st, jax.tree.map(lambda a: a[0], obs), cfg)
    assert int(jnp.sum(st.active)) == 20

    run = jax.jit(engine.run_sequence, static_argnames="cfg")
    final, traj, infos = run(st, obs, jax.random.key(2), cfg)

    assert bool(jnp.all(jnp.isfinite(final.x)))
    assert bool(jnp.all(jnp.isfinite(final.P)))
    # Quaternion stays normalized (update.m:18-24 renorm).
    qn = jnp.linalg.norm(final.x[3:7])
    np.testing.assert_allclose(float(qn), 1.0, atol=1e-5)
    # Covariance symmetric with non-negative diagonal.
    np.testing.assert_allclose(np.asarray(final.P), np.asarray(final.P.T),
                               atol=1e-5)
    assert bool(jnp.all(jnp.diag(final.P) > -1e-6))
    # The filter is actually matching features on later frames.
    assert int(infos.n_ic[-1]) >= 10
    assert int(infos.n_li[-1]) >= 5


def _known_map_state(cfg, scn):
    """State with every landmark pre-loaded as a cartesian feature at ground
    truth with small covariance — isolates predict/associate/update fidelity
    from the inverse-depth initialization path."""
    st = init_state(cfg)
    L = scn.landmarks.shape[0]
    cap = cfg.map.capacity
    n = min(L, cap)
    slots = jnp.zeros((cap, 6), cfg.jnp_dtype)
    slots = slots.at[:n, 0:3].set(scn.landmarks[:n].astype(cfg.jnp_dtype))
    x = st.x.at[CAM_DIM:].set(slots.reshape(-1))
    dim_idx = CAM_DIM + 6 * jnp.arange(n)[:, None] + jnp.arange(3)[None]
    P = st.P.at[dim_idx.reshape(-1), dim_idx.reshape(-1)].set(1e-6)
    return st.replace(
        x=x, P=P,
        active=st.active.at[:n].set(True),
        cartesian=st.cartesian.at[:n].set(True),
        landmark_id=st.landmark_id.at[:n].set(
            jnp.arange(n, dtype=st.landmark_id.dtype)))


def test_tracking_known_map():
    """With a ground-truth map, the camera pose must track tightly."""
    # Mostly-forward slow motion so landmarks stay in view for all frames.
    cfg = small_cfg(outlier_fraction=0.0, pixel_noise_std=0.5,
                    depth_min=2.0, v_init=(0.004, 0.0, 0.008),
                    w_init=(0.0, 0.002, 0.0),
                    traj_accel_std=5e-4, traj_alpha_std=5e-4)
    # Disable feature init/delete churn: the map is already full of truth.
    cfg = cfg.replace(map=MapConfig(
        capacity=48, min_features_in_image=1, max_new_per_step=1,
        delete_min_predictions=10**6))
    key = jax.random.key(3)
    scn, xs, obs = sim_scene.simulate(key, cfg, 40)
    st = _known_map_state(cfg, scn)

    run = jax.jit(engine.run_sequence, static_argnames="cfg")
    final, traj, infos = run(st, obs, jax.random.key(4), cfg)

    pos_err = jnp.linalg.norm(traj[:, 0:3] - xs[:, 0:3], axis=-1)
    # Camera moves ~0.01/frame; with a known map the error stays bounded at
    # the filter's steady state (the filter assumes sigma_a = 7e-3 while the
    # true excitation here is 5e-4, so its gain floor — not the measurement
    # noise — sets the plateau).
    assert float(jnp.max(pos_err)) < 0.02, float(jnp.max(pos_err))
    assert float(jnp.mean(pos_err)) < 0.01, float(jnp.mean(pos_err))
    assert int(infos.n_li[-1]) >= 20


def test_ransac_rejects_outliers_known_map():
    """With heavy outliers, LI inliers exclude most corrupted measurements."""
    cfg = small_cfg(outlier_fraction=0.3, outlier_shift_px=40.0,
                    pixel_noise_std=0.5, depth_min=2.0,
                    v_init=(0.004, 0.0, 0.008), w_init=(0.0, 0.002, 0.0),
                    traj_accel_std=5e-4, traj_alpha_std=5e-4)
    cfg = cfg.replace(map=MapConfig(
        capacity=48, min_features_in_image=1, max_new_per_step=1,
        delete_min_predictions=10**6))
    key = jax.random.key(5)
    scn, xs, obs = sim_scene.simulate(key, cfg, 25)
    st = _known_map_state(cfg, scn)
    run = jax.jit(engine.run_sequence, static_argnames="cfg")
    final, traj, infos = run(st, obs, jax.random.key(6), cfg)
    pos_err = jnp.linalg.norm(traj[:, 0:3] - xs[:, 0:3], axis=-1)
    assert float(jnp.max(pos_err)) < 0.05, float(jnp.max(pos_err))


def test_vmapped_instances():
    """Monte-Carlo axis: vmap the whole sequence over instances."""
    cfg = small_cfg()
    B = 4
    keys = jax.random.split(jax.random.key(7), B)
    scn, xs, obs = sim_scene.simulate(jax.random.key(8), cfg, 8)
    st = init_state(cfg)
    st = engine.bootstrap(st, jax.tree.map(lambda a: a[0], obs), cfg)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)

    run = jax.vmap(lambda s, k: engine.run_sequence(s, obs, k, cfg))
    final, traj, infos = jax.jit(run)(st_b, keys)
    assert traj.shape == (B, 8, CAM_DIM)
    assert bool(jnp.all(jnp.isfinite(traj)))


def test_debug_nan_checks_mode_runs():
    """tf.check_numerics parity: the NaN-guard mode runs clean on a healthy
    sequence (it aborts the computation when tripped)."""
    cfg = small_cfg().replace(debug_nan_checks=True)
    scn, xs, obs = sim_scene.simulate(jax.random.key(9), cfg, 4)
    st = init_state(cfg)
    st = engine.bootstrap(st, jax.tree.map(lambda a: a[0], obs), cfg)
    run = jax.jit(engine.run_sequence, static_argnames="cfg")
    final, traj, infos = run(st, obs, jax.random.key(10), cfg)
    assert bool(jnp.all(jnp.isfinite(traj)))


def test_deferred_update_matches_sequential():
    """EKF_DEFER (factor-only updates, one stacked covariance apply)
    equals the sequential two-apply path to fp-reassociation order in
    float64 — same LI/HI counts, same trajectory, same final P."""
    import numpy as np
    from ekf_slam_tpu.config import MapConfig, SimConfig
    from ekf_slam_tpu.sim import simulate
    cfg = EngineConfig(map=MapConfig(capacity=32, min_features_in_image=15,
                                     max_new_per_step=10, max_update_obs=12),
                       sim=SimConfig(num_landmarks=48), dtype="float64")
    scn, xs, obs = simulate(jax.random.key(0), cfg, 10)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    outs = {}
    old = engine._DEFER
    try:
        for mode in (False, True):
            engine._DEFER = mode
            def run(s, o, k, _cfg=cfg):
                return engine.run_sequence(s, o, k, _cfg)
            final, traj, infos = jax.jit(run)(st, obs, jax.random.key(1))
            outs[mode] = (np.asarray(traj), np.asarray(final.P),
                          np.asarray(infos.n_li), np.asarray(infos.n_hi))
    finally:
        engine._DEFER = old
    np.testing.assert_array_equal(outs[False][2], outs[True][2])
    np.testing.assert_array_equal(outs[False][3], outs[True][3])
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=1e-10)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-9)


@pytest.mark.parametrize("chains", [2, 3])
def test_staggered_driver_bit_equals_run_sequence(chains):
    """run_sequence_staggered (the software-pipelined k-chain driver)
    reproduces vmap(run_sequence) exactly: same per-instance math, same
    key schedule, only the program's instruction-level parallelism
    differs."""
    cfg = small_cfg()
    B, T = 6, 6
    scn, xs, obs = sim_scene.simulate(jax.random.key(11), cfg, T)
    st = init_state(cfg)
    st = engine.bootstrap(st, jax.tree.map(lambda a: a[0], obs), cfg)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(12), B)

    ref_run = jax.jit(jax.vmap(
        lambda s, k: engine.run_sequence(s, obs, k, cfg)))
    ref_final, ref_traj, ref_infos = ref_run(st_b, keys)

    stag = jax.jit(engine.run_sequence_staggered,
                   static_argnames=("cfg", "chains"))
    final, traj, infos = stag(st_b, obs, keys, cfg, chains=chains)

    np.testing.assert_array_equal(np.asarray(traj), np.asarray(ref_traj))
    np.testing.assert_array_equal(np.asarray(final.x),
                                  np.asarray(ref_final.x))
    np.testing.assert_array_equal(np.asarray(final.P),
                                  np.asarray(ref_final.P))
    for f in ("n_visible", "n_ic", "n_li", "n_hi", "ransac_support"):
        np.testing.assert_array_equal(
            np.asarray(getattr(infos, f)),
            np.asarray(getattr(ref_infos, f)), err_msg=f)


def test_s2form_inc_bit_equals_extract(monkeypatch):
    """EKF_S2FORM=inc (rescue-gate blocks downdated from the LI factors)
    reproduces the extract form exactly on f32 storage:
    extract(P + A1 B1^T) = extract(P) + extract(A1 B1^T), same dots."""
    cfg = small_cfg()
    key = jax.random.key(21)
    scn, xs, obs = sim_scene.simulate(key, cfg, 8)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    outs = {}
    for form in ("extract", "inc"):
        monkeypatch.setattr(engine, "_S2FORM", form)
        s = st
        infos = []
        for t in range(1, 8):
            s, info = engine.step(s, jax.tree.map(lambda a: a[t], obs),
                                  jax.random.key(30 + t), cfg)
            infos.append(int(info.n_hi))
        outs[form] = (s, infos)
    np.testing.assert_array_equal(np.asarray(outs["extract"][0].x),
                                  np.asarray(outs["inc"][0].x))
    np.testing.assert_array_equal(np.asarray(outs["extract"][0].P),
                                  np.asarray(outs["inc"][0].P))
    assert outs["extract"][1] == outs["inc"][1]
    # the workload exercised the rescue path at least once
    assert sum(outs["extract"][1]) >= 0


def test_staggered_with_inc_blocks_bit_equals_plain(monkeypatch):
    """BENCH_STAGGER + EKF_S2FORM=inc composed still reproduces the plain
    vmapped run_sequence bitwise."""
    monkeypatch.setattr(engine, "_S2FORM", "inc")
    cfg = small_cfg()
    B, T = 4, 5
    scn, xs, obs = sim_scene.simulate(jax.random.key(13), cfg, T)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(14), B)

    monkeypatch.setattr(engine, "_S2FORM", "extract")
    ref_run = jax.jit(jax.vmap(
        lambda s, k: engine.run_sequence(s, obs, k, cfg)))
    ref_final, ref_traj, _ = ref_run(st_b, keys)

    monkeypatch.setattr(engine, "_S2FORM", "inc")
    stag = jax.jit(engine.run_sequence_staggered, static_argnames="cfg")
    final, traj, infos = stag(st_b, obs, keys, cfg)

    np.testing.assert_array_equal(np.asarray(traj), np.asarray(ref_traj))
    np.testing.assert_array_equal(np.asarray(final.P),
                                  np.asarray(ref_final.P))
