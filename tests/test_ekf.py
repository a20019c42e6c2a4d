"""L2/L3 filter core vs the float64 oracle and autodiff.

Covers BASELINE.json configs[0]: single EKF predict+update step with both
landmark parametrizations + Jacobian checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import CAM_DIM, EngineConfig
from ekf_slam_tpu.filter import ekf, mapman, measurement, motion
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.oracle import oracle

CFG = EngineConfig(dtype="float64")
RNG = np.random.default_rng(3)


def rand_cam_state():
    xv = np.zeros(13)
    xv[0:3] = RNG.normal(size=3) * 0.3
    q = RNG.normal(size=4)
    xv[3:7] = q / np.linalg.norm(q)
    xv[7:10] = RNG.normal(size=3) * 0.05
    xv[10:13] = RNG.normal(size=3) * 0.03
    return xv


def batch2(fn, *args):
    """Run fn over a 2-batch (XLA:CPU size-1 transcendental precision)."""
    stacked = [jnp.stack([jnp.asarray(a)] * 2) for a in args]
    return jax.vmap(fn)(*stacked)


class TestMotion:
    def test_fv_matches_oracle(self):
        xv = rand_cam_state()
        got = batch2(lambda v: motion.fv(v, CFG.filter), xv)[0]
        np.testing.assert_allclose(got, oracle.fv(xv, 1.0, CFG.filter),
                                   rtol=1e-12)

    def test_F_matches_oracle_and_autodiff(self):
        xv = rand_cam_state()
        got = batch2(lambda v: motion.dfv_by_dxv(v, CFG.filter), xv)[0]
        np.testing.assert_allclose(got, oracle.dfv_by_dxv(xv, 1.0), rtol=1e-9)
        auto = batch2(jax.jacfwd(lambda v: motion.fv(v, CFG.filter)), xv)[0]
        np.testing.assert_allclose(got, auto, rtol=1e-9, atol=1e-12)

    def test_Q_matches_oracle(self):
        xv = rand_cam_state()
        got = batch2(lambda v: motion.process_noise(v, CFG.filter), xv)[0]
        np.testing.assert_allclose(got, oracle.func_Q(xv, 1.0, CFG.filter),
                                   rtol=1e-9, atol=1e-20)

    def test_initial_omega_singularity(self):
        """The filter's initial w = 1e-15 must produce finite F/Q."""
        st = init_state(CFG)
        F = batch2(lambda v: motion.dfv_by_dxv(v, CFG.filter), st.x[:13])[0]
        Q = batch2(lambda v: motion.process_noise(v, CFG.filter), st.x[:13])[0]
        assert np.all(np.isfinite(F)) and np.all(np.isfinite(Q))


class TestPredict:
    def make_state_with_features(self, n=3):
        cfg = EngineConfig(dtype="float64").replace(
            map=EngineConfig().map.__class__(capacity=8))
        st = init_state(cfg)
        xv = rand_cam_state()
        x = np.asarray(st.x).copy()
        x[:13] = xv
        P = np.asarray(st.P).copy()
        # random SPD camera block + a few features
        A = RNG.normal(size=(13 + 6 * n, 13 + 6 * n)) * 0.01
        spd = A @ A.T + np.eye(13 + 6 * n) * 1e-4
        D_used = 13 + 6 * n
        P[:D_used, :D_used] = spd
        for i in range(n):
            x[13 + 6 * i:19 + 6 * i] = np.concatenate(
                [RNG.normal(size=3), [0.3, -0.2, 1.1]])
        st = st.replace(
            x=jnp.asarray(x), P=jnp.asarray(P),
            active=st.active.at[:n].set(True))
        return cfg, st, x, P, D_used

    def test_predict_matches_oracle(self):
        cfg, st, x, P, D_used = self.make_state_with_features()
        xp, Pp = batch2(lambda x, P: ekf.predict(x, P, cfg.filter), st.x, st.P)
        xo, Po = oracle.predict(x[:D_used], P[:D_used, :D_used], cfg.filter)
        np.testing.assert_allclose(np.asarray(xp)[0][:D_used], xo, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(Pp)[0][:D_used, :D_used], Po, rtol=1e-9, atol=1e-18)
        # dead slots stay exactly zero
        assert np.all(np.asarray(Pp)[0][D_used:, :] == 0)


class TestUpdate:
    def test_masked_update_equals_compact_oracle(self):
        """Padded masked update == reference compact update on active rows."""
        D = 13 + 6 * 4
        A = RNG.normal(size=(D, D)) * 0.05
        P = A @ A.T + np.eye(D) * 1e-3
        x = np.concatenate([rand_cam_state(), RNG.normal(size=D - 13)])
        M = 10  # 5 potential measurements (2 rows each)
        H_full = RNG.normal(size=(M, D)) * 0.1
        z = RNG.normal(size=M)
        h = z + RNG.normal(size=M) * 0.1
        mask = np.array([1, 1, 0, 0, 1, 1, 1, 1, 0, 0], bool)

        Hm = H_full * mask[:, None]
        got_x, got_P = batch2(
            lambda x, P: ekf.update(x, P, jnp.asarray(Hm), jnp.asarray(z),
                                    jnp.asarray(h), jnp.asarray(mask),
                                    jnp.ones(M, jnp.float64)),
            x, P)
        # oracle: compact stacking of only the active rows, R = I
        # (ekf_update_li_inliers.m:8-19)
        act = mask
        xo, Po = oracle.ekf_update(
            x, P, H_full[act], np.eye(act.sum()), z[act], h[act])
        np.testing.assert_allclose(np.asarray(got_x)[0], xo, rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_P)[0], Po, rtol=1e-7,
                                   atol=1e-12)

    def test_empty_update_is_identity_plus_renorm(self):
        D = 13
        x = rand_cam_state()
        P = np.eye(D) * 1e-3
        mask = np.zeros(4, bool)
        H = np.zeros((4, D))
        got_x, got_P = batch2(
            lambda x, P: ekf.update(x, P, jnp.asarray(H), jnp.zeros(4),
                                    jnp.zeros(4), jnp.asarray(mask),
                                    jnp.ones(4)),
            x, P)
        # state unchanged except quaternion normalization
        xe = x.copy()
        xe[3:7] /= np.linalg.norm(xe[3:7])
        np.testing.assert_allclose(np.asarray(got_x)[0], xe, rtol=1e-12)


class TestMeasurement:
    def _state(self, cartesian=False):
        cfg = EngineConfig(dtype="float64").replace(
            map=EngineConfig().map.__class__(capacity=4))
        st = init_state(cfg)
        x = np.asarray(st.x).copy()
        x[:13] = rand_cam_state()
        x[7:13] = 0  # keep camera still for geometry sanity
        # a feature roughly in front of the camera
        R = oracle.q2r(x[3:7])
        fwd = R @ np.array([0.1, -0.05, 1.0])
        if cartesian:
            y = x[0:3] + fwd * 2.0
            x[13:19] = np.concatenate([y, np.zeros(3)])
        else:
            x[13:19] = np.concatenate(
                [x[0:3], [np.arctan2(fwd[0], fwd[2]),
                          np.arctan2(-fwd[1], np.hypot(fwd[0], fwd[2])), 0.5]])
        st = st.replace(
            x=jnp.asarray(x),
            active=st.active.at[0].set(True),
            cartesian=st.cartesian.at[0].set(bool(cartesian)))
        return cfg, st, x

    def test_predict_measurements_inverse_depth(self):
        cfg, st, x = self._state(False)
        h, vis, _ = jax.vmap(
            lambda x: measurement.predict_measurements(
                x, st.active, st.cartesian, cfg))(jnp.stack([st.x] * 2))
        uv_o, vis_o = oracle.hi_inverse_depth(
            x[13:19], x[0:3], oracle.q2r(x[3:7]), cfg.camera)
        assert bool(vis[0, 0]) == vis_o
        if vis_o:
            np.testing.assert_allclose(np.asarray(h)[0, 0], uv_o, rtol=1e-10)

    def test_predict_measurements_cartesian(self):
        cfg, st, x = self._state(True)
        h, vis, _ = jax.vmap(
            lambda x: measurement.predict_measurements(
                x, st.active, st.cartesian, cfg))(jnp.stack([st.x] * 2))
        uv_o, vis_o = oracle.hi_cartesian(
            x[13:16], x[0:3], oracle.q2r(x[3:7]), cfg.camera)
        assert bool(vis[0, 0]) == vis_o
        if vis_o:
            np.testing.assert_allclose(np.asarray(h)[0, 0], uv_o, rtol=1e-10)

    def test_jacobians_match_oracle(self):
        for cartesian in (False, True):
            cfg, st, x = self._state(cartesian)

            def jac(x):
                h, vis, hc = measurement.predict_measurements(
                    x, st.active, st.cartesian, cfg)
                return measurement.jacobians(x, h, hc, st.cartesian, cfg.camera)

            H_xv, H_y = jax.vmap(jac)(jnp.stack([st.x] * 2))
            if cartesian:
                uv, _ = oracle.hi_cartesian(
                    x[13:16], x[0:3], oracle.q2r(x[3:7]), cfg.camera)
                Ho_xv, Ho_y = oracle.Hi_cartesian(x[:13], x[13:16], uv, cfg.camera)
                np.testing.assert_allclose(
                    np.asarray(H_y)[0, 0, :, 0:3], Ho_y, rtol=1e-8, atol=1e-12)
                assert np.all(np.asarray(H_y)[0, 0, :, 3:6] == 0)
            else:
                uv, _ = oracle.hi_inverse_depth(
                    x[13:19], x[0:3], oracle.q2r(x[3:7]), cfg.camera)
                Ho_xv, Ho_y = oracle.Hi_inverse_depth(x[:13], x[13:19], uv,
                                                      cfg.camera)
                np.testing.assert_allclose(
                    np.asarray(H_y)[0, 0], Ho_y, rtol=1e-8, atol=1e-12)
            np.testing.assert_allclose(
                np.asarray(H_xv)[0, 0], Ho_xv, rtol=1e-8, atol=1e-12)

    def test_jacobians_match_autodiff(self):
        """H == jacfwd of the full measurement chain (modern F_Test_*)."""
        cfg, st, x = self._state(False)

        def h_of_x(xs):
            h, _, _ = measurement.predict_measurements(
                xs, st.active, st.cartesian, cfg)
            return h[0]

        auto = jax.vmap(jax.jacfwd(h_of_x))(jnp.stack([st.x] * 2))[0]

        def jac(x):
            h, vis, hc = measurement.predict_measurements(
                x, st.active, st.cartesian, cfg)
            return measurement.jacobians(x, h, hc, st.cartesian, cfg.camera)

        H_xv, H_y = jax.vmap(jac)(jnp.stack([st.x] * 2))
        np.testing.assert_allclose(np.asarray(H_xv)[0, 0],
                                   np.asarray(auto)[:, 0:13], rtol=1e-6,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(H_y)[0, 0],
                                   np.asarray(auto)[:, 13:19], rtol=1e-6,
                                   atol=1e-10)

    def test_dense_H_layout(self):
        cap = 4
        H_xv = jnp.asarray(RNG.normal(size=(cap, 2, 13)))
        H_y = jnp.asarray(RNG.normal(size=(cap, 2, 6)))
        mask = jnp.asarray([True, False, True, True])
        H = measurement.dense_H(H_xv, H_y, mask)
        assert H.shape == (8, 13 + 24)
        np.testing.assert_allclose(H[0:2, 0:13], H_xv[0])
        np.testing.assert_allclose(H[0:2, 13:19], H_y[0])
        assert np.all(np.asarray(H[2:4]) == 0)  # masked row pair
        np.testing.assert_allclose(H[4:6, 25:31], H_y[2])
        assert np.all(np.asarray(H[4:6, 13:25]) == 0)

    def test_innovation_covariance_matches_dense(self):
        cap = 4
        D = 13 + 6 * cap
        A = RNG.normal(size=(D, D))
        P = jnp.asarray(A @ A.T)
        H_xv = jnp.asarray(RNG.normal(size=(cap, 2, 13)))
        H_y = jnp.asarray(RNG.normal(size=(cap, 2, 6)))
        S = measurement.innovation_covariances(P, H_xv, H_y, 1.0)
        Hd = measurement.dense_H(H_xv, H_y, jnp.ones(cap, bool))
        S_dense = (Hd @ P @ Hd.T).reshape(cap, 2, cap, 2)
        for i in range(cap):
            np.testing.assert_allclose(
                np.asarray(S)[i], np.asarray(S_dense)[i, :, i, :] + np.eye(2),
                rtol=1e-10)


class TestMapman:
    def test_add_feature_matches_oracle(self):
        cfg = EngineConfig(dtype="float64").replace(
            map=EngineConfig().map.__class__(capacity=4))
        st = init_state(cfg)
        xv = rand_cam_state()
        x = np.asarray(st.x).copy()
        x[:13] = xv
        A = RNG.normal(size=(13, 13)) * 0.01
        P = np.asarray(st.P).copy()
        P[:13, :13] = A @ A.T + np.eye(13) * 1e-5
        st = st.replace(x=jnp.asarray(x), P=jnp.asarray(P))
        uvd = np.array([140.0, 120.0])

        def add(x, P):
            s = st.replace(x=x, P=P)
            return mapman.add_one_feature(
                s, jnp.asarray(uvd), jnp.asarray(0), jnp.asarray(7), cfg)

        out = jax.vmap(add)(jnp.stack([st.x] * 2), jnp.stack([st.P] * 2))
        xo = oracle.hinv(uvd, x[:13], cfg.camera, cfg.map.initial_rho)
        Po = oracle.add_feature_covariance_inverse_depth(
            P[:13, :13], uvd, x[:13], cfg.filter.sigma_z, cfg.map.std_rho,
            cfg.camera)
        np.testing.assert_allclose(np.asarray(out.x)[0][13:19], xo, rtol=1e-10)
        got_P = np.asarray(out.P)[0][:19, :19]
        np.testing.assert_allclose(got_P, Po, rtol=1e-8, atol=1e-15)
        assert bool(out.active[0, 0]) and int(out.landmark_id[0, 0]) == 7

    def test_add_respects_capacity(self):
        cfg = EngineConfig(dtype="float64").replace(
            map=EngineConfig().map.__class__(capacity=2))
        st = init_state(cfg)
        uvd = jnp.asarray(RNG.uniform(60, 200, size=(4, 2)))
        out = jax.vmap(lambda x, P: mapman.add_features(
            st.replace(x=x, P=P), uvd, jnp.ones(4, bool),
            jnp.arange(4, dtype=jnp.int32), cfg))(
                jnp.stack([st.x] * 2), jnp.stack([st.P] * 2))
        assert np.all(np.asarray(out.active))  # both slots filled
        assert list(np.asarray(out.landmark_id)[0]) == [0, 1]

    def test_delete_policy(self):
        cfg = EngineConfig(dtype="float64").replace(
            map=EngineConfig().map.__class__(capacity=2))
        st = init_state(cfg)
        st = st.replace(
            active=jnp.array([True, True]),
            times_predicted=jnp.array([10, 10], jnp.int32),
            times_measured=jnp.array([2, 8], jnp.int32),
            x=st.x.at[13:25].set(1.0),
            P=st.P.at[13:25, 13:25].set(jnp.eye(12) * 0.1))
        out = jax.vmap(lambda x, P: mapman.delete_features(
            st.replace(x=x, P=P), cfg))(jnp.stack([st.x] * 2),
                                        jnp.stack([st.P] * 2))
        assert not bool(out.active[0, 0])   # 2 < 0.5*10 -> dropped
        assert bool(out.active[0, 1])       # 8 >= 5 -> kept
        assert np.all(np.asarray(out.x)[0][13:19] == 0)
        assert np.all(np.asarray(out.P)[0][13:19, :] == 0)

    def test_convert_to_cartesian_matches_oracle(self):
        cfg = EngineConfig(dtype="float64").replace(
            map=EngineConfig().map.__class__(capacity=2,
                                             linearity_threshold=1e9))
        st = init_state(cfg)
        x = np.asarray(st.x).copy()
        x[:13] = rand_cam_state()
        y = np.concatenate([RNG.normal(size=3), [0.4, -0.1, 2.0]])
        x[13:19] = y
        D_used = 19
        A = RNG.normal(size=(D_used, D_used)) * 0.01
        P = np.asarray(st.P).copy()
        P[:D_used, :D_used] = A @ A.T + np.eye(D_used) * 1e-6
        st = st.replace(x=jnp.asarray(x), P=jnp.asarray(P),
                        active=st.active.at[0].set(True))
        out = jax.vmap(lambda x, P: mapman.convert_to_cartesian(
            st.replace(x=x, P=P), cfg))(jnp.stack([st.x] * 2),
                                        jnp.stack([st.P] * 2))
        assert bool(out.cartesian[0, 0])
        p_o = oracle.inversedepth_to_cartesian_point(y)
        np.testing.assert_allclose(np.asarray(out.x)[0][13:16], p_o, rtol=1e-10)
        assert np.all(np.asarray(out.x)[0][16:19] == 0)
        J = oracle.id2cartesian_jacobian(y)
        J_all = np.eye(D_used)[np.r_[0:13, 13:16], :].copy()
        J_all[13:16, 13:19] = J
        Po = J_all @ P[:D_used, :D_used] @ J_all.T
        got = np.asarray(out.P)[0][:16, :16]
        np.testing.assert_allclose(got, Po, rtol=1e-8, atol=1e-14)
