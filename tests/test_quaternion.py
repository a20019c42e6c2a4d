"""L0 math: JAX ops vs the NumPy oracle and vs autodiff.

These are the modern form of the reference's F_Test_* finite-difference
harness (SURVEY.md §4): every analytic Jacobian is checked against
jax.jacfwd of the underlying nonlinear map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.ops import quaternion as q_ops
from ekf_slam_tpu.oracle import oracle

RNG = np.random.default_rng(0)


def rand_quat(n=None):
    q = RNG.normal(size=(4,) if n is None else (n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestAgainstOracle:
    def test_qprod(self):
        for _ in range(10):
            q, p = RNG.normal(size=4), RNG.normal(size=4)
            np.testing.assert_allclose(
                q_ops.qprod(jnp.asarray(q), jnp.asarray(p)),
                oracle.qprod(q, p), rtol=1e-12)

    def test_qconj(self):
        q = RNG.normal(size=4)
        np.testing.assert_allclose(q_ops.qconj(jnp.asarray(q)), oracle.qconj(q))

    def test_q2r(self):
        for q in rand_quat(10):
            R = np.asarray(q_ops.q2r(jnp.asarray(q)))
            np.testing.assert_allclose(R, oracle.q2r(q), rtol=1e-12)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    def test_v2q(self):
        vs = np.stack([RNG.normal(size=3), np.zeros(3), np.full(3, 1e-15),
                       RNG.normal(size=3)])
        got = np.asarray(q_ops.v2q(jnp.asarray(vs)))  # batched: accurate path
        for g, v in zip(got, vs):
            np.testing.assert_allclose(g, oracle.v2q(v), rtol=1e-12, atol=1e-20)

    def test_v2q_zero_is_identity(self):
        np.testing.assert_array_equal(
            q_ops.v2q(jnp.zeros(3)), jnp.array([1.0, 0, 0, 0]))

    def test_azel_ray(self):
        th = jnp.asarray([0.3, 1.1])  # batched: see precision note in q_ops
        ph = jnp.asarray([-0.2, 0.4])
        got = np.asarray(q_ops.azel_to_ray(th, ph))
        for i in range(2):
            np.testing.assert_allclose(
                got[i], oracle.m_ray(float(th[i]), float(ph[i])), rtol=1e-12,
                atol=1e-15)

    def test_norm_jac(self):
        qs = RNG.normal(size=(2, 4))  # batched: see precision note in q_ops
        got = np.asarray(q_ops.norm_jac(jnp.asarray(qs)))
        for g, q in zip(got, qs):
            np.testing.assert_allclose(g, oracle.norm_jac(q), rtol=1e-12)

    def test_mult_matrices(self):
        q, p = RNG.normal(size=4), RNG.normal(size=4)
        qp = oracle.qprod(q, p)
        np.testing.assert_allclose(
            np.asarray(q_ops.left_mult_matrix(jnp.asarray(q))) @ p, qp, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(q_ops.right_mult_matrix(jnp.asarray(p))) @ q, qp, rtol=1e-12)

    def test_dqomegadt_by_domega(self):
        ws = np.stack([RNG.normal(size=3), np.full(3, 1e-15)])
        got = np.asarray(q_ops.dqomegadt_by_domega(jnp.asarray(ws), 1.0))
        for g, w in zip(got, ws):
            np.testing.assert_allclose(
                g, oracle.dqomegadt_by_domega(w, 1.0), rtol=1e-10, atol=5e-14)

    def test_dRq_times_a_by_dq(self):
        q, a = rand_quat(), RNG.normal(size=3)
        np.testing.assert_allclose(
            q_ops.dRq_times_a_by_dq(jnp.asarray(q), jnp.asarray(a)),
            oracle.dRq_times_a_by_dq(q, a), rtol=1e-12)


class TestAgainstAutodiff:
    """Analytic Jacobians == jacfwd of the nonlinear map (F_Test_* intent)."""

    def test_norm_jac_is_jac_of_normalize(self):
        q = jnp.asarray(RNG.normal(size=4))
        auto = jax.jacfwd(lambda q: q / jnp.linalg.norm(q))(q)
        np.testing.assert_allclose(q_ops.norm_jac(q), auto, rtol=1e-10)

    def test_dqomegadt_is_jac_of_v2q(self):
        w = jnp.asarray(RNG.normal(size=3))
        auto = jax.jacfwd(lambda w: q_ops.v2q(w * 1.0))(w)
        np.testing.assert_allclose(
            q_ops.dqomegadt_by_domega(w, 1.0), auto, rtol=1e-9)

    def test_dqomegadt_near_zero_matches_autodiff_limit(self):
        # At exactly omega=0 the analytic limit is [0; dt/2 I].
        out = q_ops.dqomegadt_by_domega(jnp.zeros(3), 1.0)
        expect = np.zeros((4, 3))
        expect[1:, :] = np.eye(3) / 2
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_dRq_is_jac_of_rotation(self):
        q = jnp.asarray(rand_quat())
        a = jnp.asarray(RNG.normal(size=3))
        auto = jax.jacfwd(lambda q: q_ops.q2r(q) @ a)(q)
        np.testing.assert_allclose(q_ops.dRq_times_a_by_dq(q, a), auto, rtol=1e-10)

    def test_mult_matrix_is_jac_of_qprod(self):
        q = jnp.asarray(RNG.normal(size=4))
        p = jnp.asarray(RNG.normal(size=4))
        np.testing.assert_allclose(
            q_ops.left_mult_matrix(q), jax.jacfwd(lambda p: q_ops.qprod(q, p))(p),
            rtol=1e-10)
        np.testing.assert_allclose(
            q_ops.right_mult_matrix(p), jax.jacfwd(lambda q: q_ops.qprod(q, p))(q),
            rtol=1e-10)


class TestEulerHelpers:
    def test_rpy_roundtrip(self):
        rpy = jnp.asarray([[0.2, -0.4, 0.9], [0.5, 0.1, -0.3]])  # batched
        R = q_ops.rpy2r(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        np.testing.assert_allclose(q_ops.r2rpy(R), rpy, rtol=1e-10, atol=1e-12)

    def test_rot_orthonormal(self):
        for rot in (q_ops.rotx, q_ops.roty, q_ops.rotz):
            R = rot(jnp.asarray([0.7, -1.2]))
            np.testing.assert_allclose(
                R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
                atol=1e-12)


def test_xla_vector_transcendental_precision():
    """Pin the XLA:CPU behavior the float64 fidelity path relies on:
    transcendentals over arrays of size >= 2 are ~1-ulp accurate in float64
    (single-element calls take a fast ~3e-8 path — the engine always runs
    batched, see ops/quaternion.py precision note)."""
    xs = np.random.default_rng(7).uniform(-3, 3, 64)
    for jf, nf in [(jnp.sin, np.sin), (jnp.cos, np.cos),
                   (jnp.arctan, np.arctan)]:
        got = np.asarray(jax.jit(jf)(jnp.asarray(xs)))
        assert np.max(np.abs(got - nf(xs))) < 1e-13, jf.__name__
    ys = np.random.default_rng(8).uniform(-3, 3, 64)
    got = np.asarray(jax.jit(jnp.arctan2)(jnp.asarray(ys), jnp.asarray(xs)))
    assert np.max(np.abs(got - np.arctan2(ys, xs))) < 1e-13


def test_vmap_batching():
    qs = jnp.asarray(rand_quat(16))
    Rs = jax.vmap(q_ops.q2r)(qs)
    assert Rs.shape == (16, 3, 3)
    np.testing.assert_allclose(Rs[3], oracle.q2r(np.asarray(qs[3])), rtol=1e-12)


def test_dq_by_deuler_matches_autodiff_up_to_euler_order():
    """dq_by_deuler (dq_by_deuler.m closed form) vs jacfwd of the module's
    own euler -> q chain: the reference's formula indexes euler angles in
    the REVERSED order of its rpy2tr composition (column-reversed
    Jacobian). func_Q's only use multiplies by an ISOTROPIC noise
    covariance (sigma_alpha^2 I), so G Pn G^T is invariant to the column
    order and parity holds (the F_test_rpy2q.m intent)."""
    import jax

    from ekf_slam_tpu.ops import quaternion as quat

    def euler_to_q(e):
        return quat.r2q(quat.rpy2r(e[0], e[1], e[2]))

    e = jnp.array([0.3, -0.2, 0.15]) * 1e-3
    J_auto = jax.jacfwd(euler_to_q)(e)
    J_ana = quat.dq_by_deuler(e)
    # first-order agreement (the reference's closed form differs in
    # second-order terms, consistent with its small-angle derivation)
    np.testing.assert_allclose(np.asarray(J_ana),
                               np.asarray(J_auto[:, ::-1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(J_ana @ J_ana.T),
                               np.asarray(J_auto @ J_auto.T), atol=1e-4)
