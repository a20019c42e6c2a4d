"""Fused mega-kernel step (engine.step_fused + the round-2 Pallas kernels)
vs the reference XLA step: stage-exact equivalence in interpret mode.

The three kernels (fused_manage_predict_pht / fused_update_tail_pht /
fused_update_tail_add) reorganize ~15 full-P memory passes into 3; the math
must stay identical. Tests run the kernels in Pallas interpret mode on CPU
in float64 and demand near-bit agreement with the unfused pipeline over
multi-frame sequences that exercise delete, convert, both updates and
feature initialization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import (EngineConfig, FilterConfig, MapConfig,
                                 SimConfig)
from ekf_slam_tpu.filter import ekf, engine, mapman, measurement, motion
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.ops import pallas_kernels as pk
from ekf_slam_tpu.sim import simulate


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pk._INTERPRET[0]
    pk._INTERPRET[0] = True
    yield
    pk._INTERPRET[0] = old


def _cfg(**kw):
    return EngineConfig(
        filter=FilterConfig(fused_step="off", **kw.pop("filter_kw", {})),
        map=MapConfig(capacity=24, min_features_in_image=12,
                      max_new_per_step=8, max_update_obs=16),
        sim=SimConfig(num_landmarks=40, **kw.pop("sim_kw", {})),
        dtype="float64")


def _run(cfg, frames=8, seed=0):
    scn, xs, obs = simulate(jax.random.key(seed), cfg, frames)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    infos = []
    for t in range(1, frames):
        st, info = engine.step(st, jax.tree.map(lambda a: a[t], obs),
                               jax.random.key(100 + t), cfg)
        infos.append(info)
    return st, infos


def test_fused_step_matches_xla_step_multiframe():
    """7 frames through both paths: identical trajectories, covariances and
    per-stage counts (deletes/converts/adds all fire in this window)."""
    base = _cfg()
    fused = dataclasses.replace(
        base, filter=dataclasses.replace(base.filter, fused_step="on"))
    st_ref, info_ref = _run(base)
    st_f, info_f = _run(fused)
    np.testing.assert_allclose(np.asarray(st_f.x), np.asarray(st_ref.x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st_f.P), np.asarray(st_ref.P),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(st_f.active),
                                  np.asarray(st_ref.active))
    np.testing.assert_array_equal(np.asarray(st_f.cartesian),
                                  np.asarray(st_ref.cartesian))
    np.testing.assert_array_equal(np.asarray(st_f.landmark_id),
                                  np.asarray(st_ref.landmark_id))
    for a, b in zip(info_f, info_ref):
        assert int(a.n_ic) == int(b.n_ic)
        assert int(a.n_li) == int(b.n_li)
        assert int(a.n_hi) == int(b.n_hi)


def test_fused_step_exercises_convert_and_delete():
    """Force an inverse-depth -> cartesian conversion (tiny rho variance ->
    linearity index < threshold) plus deletes, and check the paths agree
    through the rank-6 conversion branch of K1."""
    base = _cfg()
    fused = dataclasses.replace(
        base, filter=dataclasses.replace(base.filter, fused_step="on"))
    scn, xs, obs = simulate(jax.random.key(3), base, 4)
    st = engine.bootstrap(init_state(base),
                          jax.tree.map(lambda a: a[0], obs), base)
    for t in range(1, 3):
        st, _ = engine.step(st, jax.tree.map(lambda a: a[t], obs),
                            jax.random.key(100 + t), base)
    # Shrink the first active slot's rho variance so L = 4 sigma_d cos/d
    # drops below the threshold -> conversion fires next manage().
    slot = int(np.flatnonzero(np.asarray(st.active))[0])
    rd = 13 + 6 * slot + 5
    st = st.replace(P=st.P.at[rd, rd].set(1e-8))
    assert int(mapman.manage(st, base).cartesian.sum()) == 1

    obs3 = jax.tree.map(lambda a: a[3], obs)
    st_ref, _ = engine.step(st, obs3, jax.random.key(7), base)
    st_f, _ = engine.step(st, obs3, jax.random.key(7), fused)
    assert int(st_ref.cartesian.sum()) == 1   # convert path exercised
    np.testing.assert_array_equal(np.asarray(st_f.cartesian),
                                  np.asarray(st_ref.cartesian))
    np.testing.assert_allclose(np.asarray(st_f.x), np.asarray(st_ref.x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_f.P), np.asarray(st_ref.P),
                               rtol=1e-7, atol=1e-9)


def test_k1_kernel_matches_manage_plus_predict():
    """K1 in isolation vs apply_manage_P + ekf.predict + dense P·Hᵀ."""
    cfg = _cfg()
    scn, xs, obs = simulate(jax.random.key(1), cfg, 4)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    for t in range(1, 4):
        st, _ = engine.step(st, jax.tree.map(lambda a: a[t], obs),
                            jax.random.key(t), cfg)
    p = mapman.manage_params(st, cfg)
    P_m = mapman.apply_manage_P(st.P, p)
    x_prior_ref, P_prior_ref = ekf.predict(p.state.x, P_m, cfg.filter)

    xv = st.x[:13]
    F = motion.dfv_by_dxv(xv, cfg.filter)
    Q = motion.process_noise(xv, cfg.filter)
    x_prior = jnp.concatenate([motion.fv(xv, cfg.filter), p.state.x[13:]])
    np.testing.assert_allclose(np.asarray(x_prior), np.asarray(x_prior_ref),
                               rtol=1e-12)
    h, vis, H_xv, H_y = engine._linearize(x_prior, None, p.state, cfg)[:4]
    Ht = measurement.dense_Ht(H_xv, H_y, vis)
    # dense_Ht must be the transpose of dense_H
    vm = vis.astype(H_xv.dtype)[:, None, None]
    Hd = measurement.dense_H(H_xv, H_y, vis)
    np.testing.assert_allclose(np.asarray(Ht), np.asarray(Hd.T), atol=1e-14)

    P_k, pht = pk.fused_manage_predict_pht(
        st.P, p.keep_f, p.E6, p.U6, p.C66, F, Q, Ht)
    np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_prior_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pht),
                               np.asarray(P_prior_ref @ Ht),
                               rtol=1e-9, atol=1e-11)
    # S from pht == S from P
    S_ref = measurement.innovation_covariances(
        P_prior_ref, H_xv * vm, H_y * vm, cfg.filter.sigma_z)
    S_pht = measurement.innovation_covariances_from_pht(
        pht.reshape(P_k.shape[0], cfg.map.capacity, 2), H_xv, H_y,
        cfg.filter.sigma_z)
    vis_np = np.asarray(vis)
    np.testing.assert_allclose(np.asarray(S_pht)[vis_np],
                               np.asarray(S_ref)[vis_np],
                               rtol=1e-9, atol=1e-11)


def test_fused_step_vmaps():
    """The fused step must vmap over instances (the throughput axis)."""
    cfg = _cfg()
    fused = dataclasses.replace(
        cfg, filter=dataclasses.replace(cfg.filter, fused_step="on"))
    scn, xs, obs = simulate(jax.random.key(5), fused, 2)
    st = engine.bootstrap(init_state(fused),
                          jax.tree.map(lambda a: a[0], obs), fused)
    B = 3
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(6), B)
    obs1 = jax.tree.map(lambda a: a[1], obs)
    stepb = jax.vmap(lambda s, k: engine.step(s, obs1, k, fused)[0])
    out = stepb(stb, keys)
    assert out.P.shape == (B,) + st.P.shape
    assert bool(jnp.all(jnp.isfinite(out.P)))
