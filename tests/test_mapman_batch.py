"""Batched feature-add must equal the sequential append loop exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EngineConfig, MapConfig
from ekf_slam_tpu.filter import mapman
from ekf_slam_tpu.filter.state import init_state


def make_state(cfg, key):
    st = init_state(cfg)
    # Non-trivial camera state + P so cross terms matter.
    x = st.x.at[0:3].set(jnp.array([0.1, -0.2, 0.05]))
    q = jnp.array([0.9, 0.1, -0.2, 0.3])
    x = x.at[3:7].set(q / jnp.linalg.norm(q))
    P = st.P.at[:13, :13].add(
        0.01 * jax.random.uniform(key, (13, 13)))
    P = 0.5 * (P + P.T)
    return st.replace(x=x, P=P)


def test_batch_add_matches_sequential():
    cfg = EngineConfig(map=MapConfig(capacity=12), dtype="float64")
    st = make_state(cfg, jax.random.key(0))
    K = 6
    uvd = jax.random.uniform(jax.random.key(1), (K, 2),
                             minval=40.0, maxval=200.0).astype(jnp.float64)
    mask = jnp.array([1, 0, 1, 1, 0, 1], bool)
    ids = jnp.arange(K, dtype=jnp.int32)

    st_seq, asg_seq = mapman.add_features_assigned(st, uvd, mask, ids, cfg)
    st_bat, asg_bat = mapman.add_features_batch(st, uvd, mask, ids, cfg)

    np.testing.assert_array_equal(np.asarray(asg_seq), np.asarray(asg_bat))
    np.testing.assert_allclose(np.asarray(st_seq.x), np.asarray(st_bat.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_seq.P), np.asarray(st_bat.P),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(st_seq.active),
                                  np.asarray(st_bat.active))
    np.testing.assert_array_equal(np.asarray(st_seq.landmark_id),
                                  np.asarray(st_bat.landmark_id))


def test_batch_add_respects_capacity():
    cfg = EngineConfig(map=MapConfig(capacity=4), dtype="float64")
    st = make_state(cfg, jax.random.key(2))
    # Fill 2 slots first.
    uv0 = jax.random.uniform(jax.random.key(3), (2, 2), minval=50.0,
                             maxval=150.0).astype(jnp.float64)
    st, _ = mapman.add_features_batch(
        st, uv0, jnp.ones(2, bool), jnp.arange(2, dtype=jnp.int32), cfg)
    assert int(jnp.sum(st.active)) == 2
    # Try to add 5 more: only 2 free slots.
    uv1 = jax.random.uniform(jax.random.key(4), (5, 2), minval=50.0,
                             maxval=150.0).astype(jnp.float64)
    st2, asg = mapman.add_features_batch(
        st, uv1, jnp.ones(5, bool), 10 + jnp.arange(5, dtype=jnp.int32), cfg)
    assert int(jnp.sum(st2.active)) == 4
    assert int(jnp.sum(asg >= 0)) == 2
    assert bool(jnp.all(jnp.isfinite(st2.P)))


def test_manage_equals_sequential():
    """Fused delete+convert == delete_features then convert_to_cartesian."""
    import numpy as np
    cfg = EngineConfig(map=MapConfig(capacity=10, delete_min_predictions=3,
                                     linearity_threshold=0.5),
                       dtype="float64")
    st = make_state(cfg, jax.random.key(5))
    uvd = jax.random.uniform(jax.random.key(6), (6, 2), minval=60.0,
                             maxval=180.0).astype(jnp.float64)
    st, _ = mapman.add_features_batch(
        st, uvd, jnp.ones(6, bool), jnp.arange(6, dtype=jnp.int32), cfg)
    # Make slot 1 weak (delete candidate) and slot 3 low-uncertainty with
    # distant camera (conversion candidate).
    st = st.replace(
        times_predicted=st.times_predicted.at[1].set(10),
        times_measured=st.times_measured.at[1].set(1))
    off3 = 13 + 6 * 3 + 5
    st = st.replace(P=st.P.at[off3, off3].set(1e-8),
                    x=st.x.at[0:3].set(jnp.array([2.0, 0.3, -1.0])))

    seq = mapman.convert_to_cartesian(mapman.delete_features(st, cfg), cfg)
    fused = mapman.manage(st, cfg)
    assert bool(jnp.any(seq.cartesian)), "test setup: nothing converted"
    np.testing.assert_allclose(np.asarray(seq.x), np.asarray(fused.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(seq.P), np.asarray(fused.P),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(seq.active),
                                  np.asarray(fused.active))
    np.testing.assert_array_equal(np.asarray(seq.cartesian),
                                  np.asarray(fused.cartesian))
