"""L1 camera model: JAX vs oracle, round-trips, Jacobians vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import CameraConfig
from ekf_slam_tpu.ops import camera as cam_ops
from ekf_slam_tpu.oracle import oracle

CAM = CameraConfig()
RNG = np.random.default_rng(1)


def rand_pixels(n):
    u = RNG.uniform(20, CAM.n_cols - 20, size=n)
    v = RNG.uniform(20, CAM.n_rows - 20, size=n)
    return np.stack([u, v], axis=-1)


def test_undistort_matches_oracle():
    for uv in rand_pixels(10):
        np.testing.assert_allclose(
            cam_ops.undistort(jnp.asarray(uv), CAM), oracle.undistort(uv, CAM),
            rtol=1e-12)


def test_distort_matches_oracle():
    for uv in rand_pixels(10):
        np.testing.assert_allclose(
            cam_ops.distort(jnp.asarray(uv), CAM), oracle.distort(uv, CAM),
            rtol=1e-12)


def test_distort_undistort_roundtrip():
    uv = jnp.asarray(rand_pixels(50))
    back = cam_ops.distort(cam_ops.undistort(uv, CAM), CAM)
    np.testing.assert_allclose(back, uv, atol=1e-8)


def test_project_matches_oracle():
    pts = RNG.normal(size=(10, 3)) * [0.5, 0.5, 0] + [0, 0, 2.0]
    for p in pts:
        np.testing.assert_allclose(
            cam_ops.project(jnp.asarray(p), CAM), oracle.project(p, CAM),
            rtol=1e-12)


def test_jacob_undistort_matches_oracle_and_autodiff():
    uv = rand_pixels(1)[0]
    J = cam_ops.jacob_undistort(jnp.asarray(uv), CAM)
    np.testing.assert_allclose(J, oracle.jacob_undistort(uv, CAM), rtol=1e-12)
    auto = jax.jacfwd(lambda p: cam_ops.undistort(p, CAM))(jnp.asarray(uv))
    np.testing.assert_allclose(J, auto, rtol=1e-9)


def test_jacob_distort_is_inverse():
    uv = jnp.asarray(rand_pixels(1)[0])
    J = cam_ops.jacob_undistort(uv, CAM) @ cam_ops.jacob_distort(uv, CAM)
    np.testing.assert_allclose(J, jnp.eye(2), atol=1e-12)


def test_dhu_dhrl_matches_autodiff():
    p = jnp.asarray([0.3, -0.2, 1.7])
    auto = jax.jacfwd(lambda p: cam_ops.project(p, CAM))(p)
    np.testing.assert_allclose(cam_ops.dhu_dhrl(p, CAM), auto, rtol=1e-10)


def test_hinv_matches_oracle():
    # Batched (B=2): size-1 transcendentals on XLA:CPU take an approximate
    # path (see ops/quaternion.py precision note), batched calls are exact.
    x_cam = np.zeros(13)
    x_cam[3] = 1.0
    uvd = rand_pixels(2)
    got = cam_ops.back_project_inverse_depth(
        jnp.asarray(uvd), jnp.asarray(np.tile(x_cam[0:3], (2, 1))),
        jnp.asarray(np.tile(x_cam[3:7], (2, 1))), 1.0, CAM)
    for i in range(2):
        np.testing.assert_allclose(
            got[i], oracle.hinv(uvd[i], x_cam, CAM, 1.0), rtol=1e-11, atol=1e-13)


def test_hinv_project_roundtrip():
    """A feature initialized from a pixel must reproject to that pixel."""
    from ekf_slam_tpu.ops import quaternion as q_ops
    q = jnp.asarray([0.9, 0.1, -0.2, 0.3])
    q = q / jnp.linalg.norm(q)
    r = jnp.asarray([0.5, -0.3, 0.2])
    uvd = jnp.asarray(rand_pixels(1)[0])
    y = cam_ops.back_project_inverse_depth(uvd, r, q, 1.0, CAM)
    # reproject: hrl = R_cw((y - t) rho + m)
    mi = q_ops.azel_to_ray(y[3], y[4])
    hrl = q_ops.q2r(q).T @ ((y[0:3] - r) * y[5] + mi)
    uv_back = cam_ops.distort(cam_ops.project(hrl, CAM), CAM)
    np.testing.assert_allclose(uv_back, uvd, atol=1e-8)


def test_batched_shapes():
    uv = jnp.asarray(rand_pixels(32))
    assert cam_ops.distort(uv, CAM).shape == (32, 2)
    assert cam_ops.jacob_undistort(uv, CAM).shape == (32, 2, 2)
