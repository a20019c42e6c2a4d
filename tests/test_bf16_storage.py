"""bf16 covariance-storage fast mode (FilterConfig.p_storage="bf16").

Not a parity mode: the golden 1e-6 guarantees hold only for f32/f64
storage. These tests pin down what the fast mode DOES promise — finite,
filter-consistent behavior tracking the f32 run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import EngineConfig, FilterConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate


def _cfg(p_storage):
    return EngineConfig(
        filter=FilterConfig(p_storage=p_storage),
        map=MapConfig(capacity=40, min_features_in_image=16,
                      max_new_per_step=16),
        sim=SimConfig(num_landmarks=48),
        dtype="float32")


def _run(cfg, frames=12):
    scn, xs, obs = simulate(jax.random.key(0), cfg, frames)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    final, traj, infos = jax.jit(
        engine.run_sequence, static_argnames="cfg")(
        st, obs, jax.random.key(1), cfg)
    return xs, final, traj, infos


def test_bf16_storage_finite_and_tracks_f32():
    cfg16 = _cfg("bf16")
    xs, final16, traj16, _ = _run(cfg16)
    assert final16.P.dtype == jnp.bfloat16          # storage really halved
    assert bool(jnp.all(jnp.isfinite(traj16)))
    assert bool(jnp.all(jnp.isfinite(final16.P.astype(jnp.float32))))

    _, final32, traj32, _ = _run(_cfg("f32"))
    err16 = np.linalg.norm(np.asarray(traj16[:, :3] - xs[:, :3]), axis=-1)
    err32 = np.linalg.norm(np.asarray(traj32[:, :3] - xs[:, :3]), axis=-1)
    # Fast mode must stay in the same accuracy class as the f32 filter
    # (identical RANSAC draws; only covariance rounding differs).
    assert err16.mean() < max(2.0 * err32.mean(), 0.05)
    # Covariance stays symmetric-PSD-ish: diagonal non-negative.
    diag = np.asarray(jnp.diagonal(final16.P.astype(jnp.float32)))
    assert (diag >= -1e-3).all()


def test_bf16_storage_vmap_and_fused_gate():
    cfg16 = _cfg("bf16")
    # The Pallas mega-kernel path requires f32 storage — auto must gate off.
    assert not engine._use_fused(dataclasses.replace(
        cfg16, filter=dataclasses.replace(cfg16.filter, fused_step="auto")))
    scn, xs, obs = simulate(jax.random.key(2), cfg16, 3)
    st = engine.bootstrap(init_state(cfg16),
                          jax.tree.map(lambda a: a[0], obs), cfg16)
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (3,) + a.shape), st)
    keys = jax.random.split(jax.random.key(3), 3)
    final, traj, _ = jax.vmap(
        lambda s, k: engine.run_sequence(s, obs, k, cfg16))(stb, keys)
    assert bool(jnp.all(jnp.isfinite(traj)))


def test_tail16_single_pass_contract(monkeypatch):
    """EKF_TAIL16=1 (single DEFAULT-precision bf16 folded-correction dot,
    bf16 storage only): finite, PSD-ish, and within ~4x of the f32 run's
    trajectory error. MEASURED to double the fast mode's drift (factor
    rounding of the correction) — that is why it defaults OFF; this test
    pins the degraded-but-bounded contract, not fast-mode accuracy."""
    from ekf_slam_tpu.filter import ekf

    monkeypatch.setattr(ekf, "_TAIL16", True)
    cfg16 = _cfg("bf16")
    xs, final16, traj16, _ = _run(cfg16)
    assert bool(jnp.all(jnp.isfinite(traj16)))
    err16 = np.linalg.norm(np.asarray(traj16[:, :3] - xs[:, :3]), axis=-1)
    monkeypatch.setattr(ekf, "_TAIL16", False)
    _, _, traj32, _ = _run(_cfg("f32"))
    err32 = np.linalg.norm(np.asarray(traj32[:, :3] - xs[:, :3]), axis=-1)
    assert err16.mean() < max(4.0 * err32.mean(), 0.15)
    diag = np.asarray(jnp.diagonal(final16.P.astype(jnp.float32)))
    assert (diag >= -1e-3).all()


@pytest.mark.slow
def test_bf16_drift_band_headline_shape():
    """Regression pin for the r3 drift measurement (docs/BENCH.md r3,
    tools/measure_pstore_drift.py): at the HEADLINE bench shape
    (CAP=100, M=24, NHYP=64, 16 frames — single instance on CPU), the
    bf16-P fast mode must stay inside the measured accuracy band: mean
    position error under the 0.2 bench gate and within 2.5x of the f32
    parity run on the same scenario (TPU-measured deltas: 0.0988 vs
    0.0883 over 256 instances)."""
    from ekf_slam_tpu.config import MapConfig, RansacConfig

    def cfg(p_storage):
        return EngineConfig(
            filter=FilterConfig(gain_solver="newton", p_storage=p_storage),
            map=MapConfig(capacity=100, min_features_in_image=25,
                          max_new_per_step=10, max_update_obs=24),
            ransac=RansacConfig(num_hypotheses=64),
            sim=SimConfig(num_landmarks=128),
            dtype="float32")

    xs16, _, traj16, _ = _run(cfg("bf16"), frames=16)
    xs32, _, traj32, _ = _run(cfg("f32"), frames=16)
    err16 = np.linalg.norm(np.asarray(traj16[:, :3] - xs16[:, :3]),
                           axis=-1).mean()
    err32 = np.linalg.norm(np.asarray(traj32[:, :3] - xs32[:, :3]),
                           axis=-1).mean()
    assert np.isfinite(err16) and np.isfinite(err32)
    assert err32 < 0.2, f"f32 parity run not tracking: {err32:.4f}"
    assert err16 < 0.2, f"bf16 fast mode outside bench gate: {err16:.4f}"
    assert err16 < 2.5 * max(err32, 0.02), (err16, err32)
