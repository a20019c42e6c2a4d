"""Camera motion models, their analytic Jacobians and process noise (L2).

Behavior sources: matlab_code/fv.m:1-47 (four motion models over the 13-dim
camera state [r q v w]), dfv_by_dxv.m:1-81 (13x13 analytic F),
func_Q.m:12-27 (Q = G Pn Gᵀ with the quaternion chain
dq3_by_dq1(q)·dqomegadt_by_domega). The motion-model switch is a jit-static
Python branch on config (no traced control flow).

The `constant_position_and_orientation_location_noise` variant of the
reference differs from `constant_position_and_orientation` only in its G
(Euler-angle noise injection, func_Q.m:3-11); it is provided via
`process_noise_euler` for parity but is not part of the default pipeline —
the reference's own driver only ever uses constant_velocity (mono_slam.m:32).
"""

from __future__ import annotations

import jax.numpy as jnp

from ekf_slam_tpu import config as cfg_mod
from ekf_slam_tpu.config import FilterConfig
from ekf_slam_tpu.ops import quaternion as quat


def fv(xv: jnp.ndarray, cfg: FilterConfig) -> jnp.ndarray:
    """One motion-model step of the camera block (fv.m).

    xv: (..., 13). Returns (..., 13).
    """
    dt = cfg.delta_t
    r, q, v, w = xv[..., 0:3], xv[..., 3:7], xv[..., 7:10], xv[..., 10:13]
    model = cfg.motion_model
    if model == cfg_mod.CONSTANT_VELOCITY:
        r_new = r + v * dt
        q_new = quat.qprod(q, quat.v2q(w * dt))
    elif model == cfg_mod.CONSTANT_ORIENTATION:
        r_new = r + v * dt
        q_new = q
        w = jnp.zeros_like(w)
    elif model == cfg_mod.CONSTANT_POSITION:
        r_new = r
        q_new = quat.qprod(q, quat.v2q(w * dt))
        v = jnp.zeros_like(v)
    elif model == cfg_mod.CONSTANT_POSITION_AND_ORIENTATION:
        r_new = r
        q_new = q
        v = jnp.zeros_like(v)
        w = jnp.zeros_like(w)
    else:
        raise ValueError(f"unknown motion model {model}")
    return jnp.concatenate([r_new, q_new, v, w], axis=-1)


def dfv_by_dxv(xv: jnp.ndarray, cfg: FilterConfig) -> jnp.ndarray:
    """13x13 analytic state-transition Jacobian F (dfv_by_dxv.m).

    ∂q'/∂q = L(v2q(wΔt)) (left-multiplication matrix, dfv_by_dxv.m:8-9);
    ∂r'/∂v = IΔt; ∂q'/∂w = R(q)·∂q(wΔt)/∂w (dfv_by_dxv.m:12-13, using the
    right-multiplication matrix the reference left missing).
    Returns (..., 13, 13).
    """
    dt = cfg.delta_t
    dtype = xv.dtype
    q, w = xv[..., 3:7], xv[..., 10:13]
    batch = xv.shape[:-1]
    F = jnp.broadcast_to(jnp.eye(13, dtype=dtype), batch + (13, 13))

    # ∂(q ⊗ q(wΔt))/∂q is the RIGHT-multiplication matrix of q(wΔt) — the
    # reference's dq3_by_dq2(qwt) builds exactly this pattern despite the
    # name (dq3_by_dq2.m:7-11), and jacfwd confirms it (tests/test_ekf.py).
    qwt = quat.v2q(w * dt)
    F = F.at[..., 3:7, 3:7].set(quat.right_mult_matrix(qwt))

    model = cfg.motion_model
    if model == cfg_mod.CONSTANT_VELOCITY:
        F = F.at[..., 0:3, 7:10].set(jnp.eye(3, dtype=dtype) * dt)
        # ∂(q ⊗ q(wΔt))/∂w = L(q) · ∂q(wΔt)/∂w — L(q) is the reference's
        # missing dq3_by_dq1 (dfv_by_dxv.m:13).
        dq_dw = quat.left_mult_matrix(q) @ quat.dqomegadt_by_domega(w, dt)
        F = F.at[..., 3:7, 10:13].set(dq_dw)
    elif model == cfg_mod.CONSTANT_ORIENTATION:
        F = F.at[..., 0:3, 7:10].set(jnp.eye(3, dtype=dtype) * dt)
        F = F.at[..., 3:7, 3:7].set(jnp.eye(4, dtype=dtype))
        F = F.at[..., 10:13, 10:13].set(0.0)
    elif model == cfg_mod.CONSTANT_POSITION:
        F = F.at[..., 7:10, 7:10].set(0.0)
        dq_dw = quat.left_mult_matrix(q) @ quat.dqomegadt_by_domega(w, dt)
        F = F.at[..., 3:7, 10:13].set(dq_dw)
    elif model == cfg_mod.CONSTANT_POSITION_AND_ORIENTATION:
        F = F.at[..., 3:7, 3:7].set(jnp.eye(4, dtype=dtype))
        F = F.at[..., 7:10, 7:10].set(0.0)
        F = F.at[..., 10:13, 10:13].set(0.0)
    return F


def process_noise(xv: jnp.ndarray, cfg: FilterConfig) -> jnp.ndarray:
    """Q = G Pn Gᵀ (func_Q.m:12-27), Pn = diag(σa²Δt², σα²Δt²) ⊗ I₃.

    G: IΔt into r, R(q)·dq(wΔt)/dw into q, I into v and w. Returns (...,13,13).
    """
    dt = cfg.delta_t
    dtype = xv.dtype
    q, w = xv[..., 3:7], xv[..., 10:13]
    batch = xv.shape[:-1]
    G = jnp.zeros(batch + (13, 6), dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    G = G.at[..., 0:3, 0:3].set(eye3 * dt)
    G = G.at[..., 3:7, 3:6].set(
        quat.left_mult_matrix(q) @ quat.dqomegadt_by_domega(w, dt))
    G = G.at[..., 7:10, 0:3].set(eye3)
    G = G.at[..., 10:13, 3:6].set(eye3)
    pn = jnp.concatenate([
        jnp.full((3,), (cfg.sigma_a * dt) ** 2, dtype),
        jnp.full((3,), (cfg.sigma_alpha * dt) ** 2, dtype)])
    return (G * pn) @ jnp.swapaxes(G, -1, -2)


def process_noise_euler(xv: jnp.ndarray, cfg: FilterConfig) -> jnp.ndarray:
    """Euler-angle-noise G for the constant_position_and_orientation_
    location_noise model (func_Q.m:3-11): G = [IΔt into r; dq/deuler into q]."""
    dt = cfg.delta_t
    dtype = xv.dtype
    q = xv[..., 3:7]
    rpy = quat.r2rpy(quat.q2r(q))
    batch = xv.shape[:-1]
    G = jnp.zeros(batch + (13, 6), dtype)
    G = G.at[..., 0:3, 0:3].set(jnp.eye(3, dtype=dtype) * dt)
    G = G.at[..., 3:7, 3:6].set(quat.dq_by_deuler(rpy))
    pn = jnp.concatenate([
        jnp.full((3,), (cfg.sigma_a * dt) ** 2, dtype),
        jnp.full((3,), (cfg.sigma_alpha * dt) ** 2, dtype)])
    return (G * pn) @ jnp.swapaxes(G, -1, -2)
