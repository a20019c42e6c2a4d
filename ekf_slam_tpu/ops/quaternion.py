"""Quaternion / rotation algebra with analytic Jacobians (layer L0).

Pure jnp functions, dtype-preserving, safe at the |omega| -> 0 singularity
(branchless `where` guards with the exact Taylor limits), so they are valid
under jit/vmap/grad at every input — unlike the reference, which divides by
|omega| (matlab_code/dqomegadt_by_domega.m) and only survives because the
filter is seeded with omega = 1e-15 (initialize_x_and_p.m:6).

Quaternion convention: q = [w, x, y, z], Hamilton product, matching
matlab_code/{q2r,qprod,qconj,v2q}.m. All functions accept a trailing-axis
layout so they vmap cleanly over filter instances.

Behavior sources: q2r.m:1-10, qprod.m:1-7, qconj.m:1-5, v2q.m:1-16 (+ the
missing quaternions() helper it calls: [cos(t/2), sin(t/2)*v_n]),
m.m:1-16, normJac.m:1-15, dq3_by_dq2.m:1-14 (and its missing right-product
twin dq3_by_dq1, SURVEY.md §2.9), dqomegadt_by_domega.m:1-50,
dqbar_by_dq.m:1-4, dRq_times_a_by_dq.m:1-77.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 2.220446049250313e-16  # MATLAB eps (double); v2q.m:11 threshold


# PRECISION NOTE (float64 oracle path): XLA:CPU lowers *single-element*
# (size-1/rank-0) transcendentals (sin/cos/atan/atan2) through a fast
# approximation with only ~3e-8 accuracy even in float64, while arrays of
# size >= 2 take an accurate (~1 ulp) path. The <=1e-6 oracle-fidelity
# guarantee therefore holds for the engine's real operating mode — everything
# vmapped over a batch axis >= 2 — and tests/test_quaternion.py
# ::test_xla_vector_transcendental_precision pins this XLA behavior.


def qprod(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q ⊗ p (qprod.m:1-7)."""
    a, v = q[..., 0], q[..., 1:]
    x, u = p[..., 0], p[..., 1:]
    w = a * x - jnp.sum(v * u, axis=-1)
    xyz = a[..., None] * u + x[..., None] * v + jnp.cross(v, u)
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (qconj.m:1-5)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def q2r(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix, Davison form (q2r.m:1-10).

    Note: like the reference, assumes |q| = 1 (no normalization inside).
    Returns (..., 3, 3).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [r * r + x * x - y * y - z * z, 2 * (x * y - r * z), 2 * (z * x + r * y)],
        axis=-1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), r * r - x * x + y * y - z * z, 2 * (y * z - r * x)],
        axis=-1)
    row2 = jnp.stack(
        [2 * (z * x - r * y), 2 * (y * z + r * x), r * r - x * x - y * y + z * z],
        axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def v2q(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> quaternion (v2q.m:1-16 + missing quaternions()).

    q = [cos(θ/2), sin(θ/2) v/θ], θ = |v|; identity quaternion for θ < eps.
    Branchless: sin(θ/2)/θ is evaluated through its series limit 1/2 at 0.
    """
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    half = 0.5 * safe_theta
    w = jnp.where(small, jnp.ones_like(theta), jnp.cos(half))
    s = jnp.where(small, jnp.zeros_like(theta), jnp.sin(half) / safe_theta)
    return jnp.concatenate([w[..., None], s[..., None] * v], axis=-1)


def azel_to_ray(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Azimuth/elevation -> unit ray m(θ,φ) (m.m:1-16).

    m = [cosφ sinθ, −sinφ, cosφ cosθ], stacked on the last axis.
    """
    cphi = jnp.cos(phi)
    return jnp.stack(
        [cphi * jnp.sin(theta), -jnp.sin(phi), cphi * jnp.cos(theta)], axis=-1)


def dm_dtheta(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """∂m/∂θ (inversedepth_2_cartesian.m:38)."""
    cphi = jnp.cos(phi)
    return jnp.stack(
        [cphi * jnp.cos(theta), jnp.zeros_like(theta), -cphi * jnp.sin(theta)],
        axis=-1)


def dm_dphi(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """∂m/∂φ (inversedepth_2_cartesian.m:39)."""
    sphi = jnp.sin(phi)
    return jnp.stack(
        [-sphi * jnp.sin(theta), -jnp.cos(phi), -sphi * jnp.cos(theta)], axis=-1)


def norm_jac(q: jnp.ndarray) -> jnp.ndarray:
    """4x4 Jacobian of q / |q| (normJac.m:1-15). Returns (..., 4, 4)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = (r * r + x * x + y * y + z * z) ** -1.5
    rows = [
        jnp.stack([x * x + y * y + z * z, -r * x, -r * y, -r * z], axis=-1),
        jnp.stack([-x * r, r * r + y * y + z * z, -x * y, -x * z], axis=-1),
        jnp.stack([-y * r, -y * x, r * r + x * x + z * z, -y * z], axis=-1),
        jnp.stack([-z * r, -z * x, -z * y, r * r + x * x + y * y], axis=-1),
    ]
    return n[..., None, None] * jnp.stack(rows, axis=-2)


def left_mult_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """L(q): qprod(q, p) == L(q) @ p — a.k.a. dq3_by_dq2 (dq3_by_dq2.m:1-14)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([w, -x, -y, -z], axis=-1),
        jnp.stack([x, w, -z, y], axis=-1),
        jnp.stack([y, z, w, -x], axis=-1),
        jnp.stack([z, -y, x, w], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def right_mult_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """R(p): qprod(q, p) == R(p) @ q — the missing dq3_by_dq1
    (called at dfv_by_dxv.m:13 and func_Q.m:24; SURVEY.md §2.9)."""
    w, x, y, z = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    rows = [
        jnp.stack([w, -x, -y, -z], axis=-1),
        jnp.stack([x, w, z, -y], axis=-1),
        jnp.stack([y, -z, w, x], axis=-1),
        jnp.stack([z, y, -x, w], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def dqbar_dq(dtype=jnp.float32) -> jnp.ndarray:
    """∂(q̄)/∂q = diag(1,-1,-1,-1) (dqbar_by_dq.m:1-4)."""
    return jnp.diag(jnp.array([1.0, -1.0, -1.0, -1.0], dtype=dtype))


def dqomegadt_by_domega(omega: jnp.ndarray, delta_t: float) -> jnp.ndarray:
    """4x3 ∂q(ω·Δt)/∂ω (dqomegadt_by_domega.m:1-50), singularity-safe.

    Exact Davison ancillary decomposition away from 0; at |ω| -> 0 the limit
    is [0; (Δt/2)·I₃] (each entry's series limit), selected branchlessly.
    """
    dt = jnp.asarray(delta_t, dtype=omega.dtype)
    mod2 = jnp.sum(omega * omega, axis=-1)
    mod = jnp.sqrt(mod2)
    small = mod < 1e-30
    safe = jnp.where(small, jnp.ones_like(mod), mod)

    s = jnp.sin(safe * dt / 2.0)
    c = jnp.cos(safe * dt / 2.0)
    w = omega  # (..., 3)

    # Row 0: dq0/dωA = (-Δt/2)(ωA/|ω|) sin(|ω|Δt/2)          -> 0 at origin
    row0 = (-dt / 2.0) * (w / safe[..., None]) * s[..., None]
    row0 = jnp.where(small[..., None], jnp.zeros_like(row0), row0)

    # Diagonal of rows 1..3:
    #   (Δt/2)(ωA²/|ω|²) cos + (1/|ω|)(1-ωA²/|ω|²) sin       -> Δt/2 at origin
    frac = (w * w) / safe[..., None] ** 2
    diag = (dt / 2.0) * frac * c[..., None] + (1.0 / safe[..., None]) * (1.0 - frac) * s[..., None]
    diag = jnp.where(small[..., None], jnp.full_like(diag, dt / 2.0), diag)

    # Off-diagonal: (ωAωB/|ω|²)((Δt/2)cos − (1/|ω|) sin)     -> 0 at origin
    factor = (dt / 2.0) * c - s / safe
    outer = (w[..., :, None] * w[..., None, :]) / safe[..., None, None] ** 2
    off = outer * factor[..., None, None]
    off = jnp.where(small[..., None, None], jnp.zeros_like(off), off)

    lower = off + (diag[..., :, None] - off) * jnp.eye(3, dtype=omega.dtype)
    return jnp.concatenate([row0[..., None, :], lower], axis=-2)


def dRq_times_a_by_dq(q: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """3x4 ∂(R(q)·a)/∂q (dRq_times_a_by_dq.m:1-77). Returns (..., 3, 4)."""
    q0, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    two = 2.0
    dR0 = mat([[two * q0, -two * qz, two * qy],
               [two * qz, two * q0, -two * qx],
               [-two * qy, two * qx, two * q0]])
    dRx = mat([[two * qx, two * qy, two * qz],
               [two * qy, -two * qx, -two * q0],
               [two * qz, two * q0, -two * qx]])
    dRy = mat([[-two * qy, two * qx, two * q0],
               [two * qx, two * qy, two * qz],
               [-two * q0, two * qz, -two * qy]])
    dRz = mat([[-two * qz, -two * q0, two * qx],
               [two * q0, -two * qz, two * qy],
               [two * qx, two * qy, two * qz]])
    cols = [jnp.einsum("...ij,...j->...i", dR, a) for dR in (dR0, dRx, dRy, dRz)]
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# Euler / homogeneous-transform helpers (rot.m, rotx.m, q2tr.m, rpy2tr.m,
# tr2rpy.m, rpy.m — the Peter Corke-era utility layer).  Provided for parity;
# only the constant_position_and_orientation_location_noise branch of the
# process noise uses them (func_Q.m:3-11).
# ---------------------------------------------------------------------------

def rotx(t):
    c, s = jnp.cos(t), jnp.sin(t)
    o, z = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack([
        jnp.stack([o, z, z], axis=-1),
        jnp.stack([z, c, -s], axis=-1),
        jnp.stack([z, s, c], axis=-1)], axis=-2)


def roty(t):
    """The missing roty (rpy2tr.m:14, SURVEY.md §2.9)."""
    c, s = jnp.cos(t), jnp.sin(t)
    o, z = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1)], axis=-2)


def rotz(t):
    """The missing rotz (rpy2tr.m:15, SURVEY.md §2.9)."""
    c, s = jnp.cos(t), jnp.sin(t)
    o, z = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1)], axis=-2)


def rpy2r(roll, pitch, yaw):
    """ZYX Euler -> R (rpy2tr.m:13-15 composition rotz(r)*roty(p)*rotx(y))."""
    return rotz(roll) @ roty(pitch) @ rotx(yaw)


def r2rpy(R: jnp.ndarray) -> jnp.ndarray:
    """R -> [roll pitch yaw] (tr2rpy.m convention, non-degenerate branch)."""
    roll = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    pitch = jnp.arctan2(-R[..., 2, 0], cr * R[..., 0, 0] + sr * R[..., 1, 0])
    yaw = jnp.arctan2(sr * R[..., 0, 2] - cr * R[..., 1, 2],
                      cr * R[..., 1, 1] - sr * R[..., 0, 1])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def r2q(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w x y z] — the reference's
    missing `tr2q` (called from jacob_rpy2q via F_test_rpy2q.m:6,
    SURVEY.md §2.9). Branchless Shepperd-style selection of the largest
    of the four squared components (stable for every rotation)."""
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    t = r00 + r11 + r22
    # Four candidate 4*q_i^2 values.
    qw2 = 1.0 + t
    qx2 = 1.0 + r00 - r11 - r22
    qy2 = 1.0 - r00 + r11 - r22
    qz2 = 1.0 - r00 - r11 + r22
    # Build all four candidate quaternions; pick by argmax (vectorizes).
    s_w = 2.0 * jnp.sqrt(jnp.maximum(qw2, 1e-12))
    cand_w = jnp.stack([
        s_w / 4.0,
        (R[..., 2, 1] - R[..., 1, 2]) / s_w,
        (R[..., 0, 2] - R[..., 2, 0]) / s_w,
        (R[..., 1, 0] - R[..., 0, 1]) / s_w], axis=-1)
    s_x = 2.0 * jnp.sqrt(jnp.maximum(qx2, 1e-12))
    cand_x = jnp.stack([
        (R[..., 2, 1] - R[..., 1, 2]) / s_x,
        s_x / 4.0,
        (R[..., 0, 1] + R[..., 1, 0]) / s_x,
        (R[..., 0, 2] + R[..., 2, 0]) / s_x], axis=-1)
    s_y = 2.0 * jnp.sqrt(jnp.maximum(qy2, 1e-12))
    cand_y = jnp.stack([
        (R[..., 0, 2] - R[..., 2, 0]) / s_y,
        (R[..., 0, 1] + R[..., 1, 0]) / s_y,
        s_y / 4.0,
        (R[..., 1, 2] + R[..., 2, 1]) / s_y], axis=-1)
    s_z = 2.0 * jnp.sqrt(jnp.maximum(qz2, 1e-12))
    cand_z = jnp.stack([
        (R[..., 1, 0] - R[..., 0, 1]) / s_z,
        (R[..., 0, 2] + R[..., 2, 0]) / s_z,
        (R[..., 1, 2] + R[..., 2, 1]) / s_z,
        s_z / 4.0], axis=-1)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def dq_by_deuler(euler: jnp.ndarray) -> jnp.ndarray:
    """4x3 ∂q/∂(rpy) small-angle closed form (dq_by_deuler.m:1-10)."""
    r, p, y = euler[..., 0] / 2, euler[..., 1] / 2, euler[..., 2] / 2
    cr, sr, cp, sp, cy, sy = (jnp.cos(r), jnp.sin(r), jnp.cos(p),
                              jnp.sin(p), jnp.cos(y), jnp.sin(y))
    rows = [
        jnp.stack([-sr * cp * cy, -cr * sp * cy, -cr * cp * sy], axis=-1) * 0.5,
        jnp.stack([cr * cp * cy, -sr * sp * cy, -sr * cp * sy], axis=-1) * 0.5,
        jnp.stack([-sr * sp * cy, cr * cp * cy, -cr * sp * sy], axis=-1) * 0.5,
        jnp.stack([-sr * cp * sy, -cr * sp * sy, cr * cp * cy], axis=-1) * 0.5,
    ]
    return jnp.stack(rows, axis=-2)
