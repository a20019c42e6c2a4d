"""Mesh utilities + sharded Monte-Carlo ensemble on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import CAM_DIM, EngineConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.parallel import make_mesh, run_ensemble, shard_batch
from ekf_slam_tpu.sim import scene as sim_scene


def test_make_mesh_shapes():
    m1 = make_mesh()
    assert m1.axis_names == ("data",)
    assert m1.devices.shape == (8,)
    m2 = make_mesh(data=4, model=2)
    assert m2.axis_names == ("data", "model")
    assert m2.devices.shape == (4, 2)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    x = jnp.zeros((16, 5))
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8


def test_run_ensemble_sharded():
    cfg = EngineConfig(
        map=MapConfig(capacity=16, min_features_in_image=8,
                      max_new_per_step=8),
        sim=SimConfig(num_landmarks=24))
    B, T = 8, 4
    scn, xs, obs = sim_scene.simulate(jax.random.key(0), cfg, T)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(1), B)
    mesh = make_mesh()
    final, traj, mean, cov = run_ensemble(st_b, obs, keys, cfg, mesh)
    assert traj.shape == (B, T, CAM_DIM)
    assert mean.shape == (T, CAM_DIM)
    assert cov.shape == (T, 3, 3)
    assert bool(jnp.all(jnp.isfinite(traj)))
    # Ensemble mean equals the plain mean of per-instance trajectories.
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(jnp.mean(traj, axis=0)),
                               atol=1e-6)
