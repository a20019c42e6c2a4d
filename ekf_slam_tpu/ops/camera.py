"""Camera model: pinhole projection + 2-parameter radial distortion (layer L1).

Behavior sources (math only, re-implemented for batched trailing-axis jnp):
* projection `hu`           — matlab_code/hu.m:1-14
* undistortion (closed form)— matlab_code/undistort_fm.m:1-27
* distortion (Newton solve) — matlab_code/distort_fm.m:1-38 (fixed 10-iter
  Newton on the radial map, expressed as lax.fori_loop so the trip count is
  static under jit)
* undistort Jacobian        — matlab_code/jacob_undistor_fm.m:1-34
* back-projection `hinv`    — matlab_code/hinv.m:1-28
* pinhole Jacobian          — matlab_code/calculate_Hi_inverse_depth.m:138-156

All functions take pixel coordinates on the last axis: uv[..., 0] = u (col),
uv[..., 1] = v (row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import CameraConfig
from ekf_slam_tpu.ops import quaternion as quat


def project(hrl: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Undistorted pinhole projection of camera-frame points (hu.m:1-14).

    hrl: (..., 3) points in the camera frame. Returns (..., 2) pixels.
    No division guard — matches the reference; callers gate on z > 0 via the
    FoV mask (hi_inverse_depth.m:37-43).
    """
    dt = hrl.dtype
    fku = jnp.asarray(cam.f / cam.d, dt)
    u = cam.cx + (hrl[..., 0] / hrl[..., 2]) * fku
    v = cam.cy + (hrl[..., 1] / hrl[..., 2]) * fku
    return jnp.stack([u, v], axis=-1)


def undistort(uvd: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Distorted -> undistorted pixels, closed form (undistort_fm.m:1-27)."""
    dt = uvd.dtype
    center = jnp.array([cam.cx, cam.cy], dt)
    xy = (uvd - center) * jnp.asarray(cam.d, dt)
    rd2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    D = 1.0 + cam.k1 * rd2 + cam.k2 * rd2 * rd2
    return xy * D / cam.d + center


def distort(uvu: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Undistorted -> distorted pixels via Newton inversion (distort_fm.m).

    Solves rd + k1·rd³ + k2·rd⁵ = ru with the reference's fixed 10 iterations
    and its initial guess rd = ru/(1 + k1·ru² + k2·ru⁴) (distort_fm.m:26-32).
    """
    dt = uvu.dtype
    k1 = jnp.asarray(cam.k1, dt)
    k2 = jnp.asarray(cam.k2, dt)
    center = jnp.array([cam.cx, cam.cy], dt)
    xy = (uvu - center) * jnp.asarray(cam.d, dt)
    ru = jnp.sqrt(jnp.sum(xy * xy, axis=-1))
    rd0 = ru / (1.0 + k1 * ru**2 + k2 * ru**4)

    def newton(_, rd):
        f = rd + k1 * rd**3 + k2 * rd**5 - ru
        fp = 1.0 + 3.0 * k1 * rd**2 + 5.0 * k2 * rd**4
        return rd - f / fp

    rd = jax.lax.fori_loop(0, cam.distort_newton_iters, newton, rd0)
    D = 1.0 + k1 * rd**2 + k2 * rd**4
    return xy / (D[..., None] * cam.d) + center


def jacob_undistort(uvd: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """2x2 ∂(undistorted uv)/∂(distorted uv) (jacob_undistor_fm.m:1-34)."""
    dt = uvd.dtype
    d = jnp.asarray(cam.d, dt)
    k1 = jnp.asarray(cam.k1, dt)
    k2 = jnp.asarray(cam.k2, dt)
    du = uvd[..., 0] - cam.cx
    dv = uvd[..., 1] - cam.cy
    xd = du * d
    yd = dv * d
    rd2 = xd * xd + yd * yd
    rd4 = rd2 * rd2
    base = 1.0 + k1 * rd2 + k2 * rd4
    g = k1 + 2.0 * k2 * rd2
    uu_ud = base + du * g * (2.0 * du * d * d)
    vu_vd = base + dv * g * (2.0 * dv * d * d)
    uu_vd = du * g * (2.0 * dv * d * d)
    vu_ud = dv * g * (2.0 * du * d * d)
    row0 = jnp.stack([uu_ud, uu_vd], axis=-1)
    row1 = jnp.stack([vu_ud, vu_vd], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def jacob_distort(uvd: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """2x2 ∂(distorted)/∂(undistorted) = inv(jacob_undistort)
    (jacob_distor_fm.m:1-13 / calculate_Hi_inverse_depth.m:123-126)."""
    J = jacob_undistort(uvd, cam)
    det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    inv = jnp.stack([
        jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1),
        jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1)], axis=-2)
    return inv / det[..., None, None]


def dhu_dhrl(hrl: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """2x3 pinhole Jacobian ∂(undistorted uv)/∂(camera-frame point)
    (calculate_Hi_inverse_depth.m:138-156)."""
    dt = hrl.dtype
    fku = jnp.asarray(cam.f / cam.d, dt)
    x, y, z = hrl[..., 0], hrl[..., 1], hrl[..., 2]
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([fku / z, zero, -x * fku / (z * z)], axis=-1)
    row1 = jnp.stack([zero, fku / z, -y * fku / (z * z)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def back_project_inverse_depth(uvd: jnp.ndarray, r_w: jnp.ndarray,
                               q_wr: jnp.ndarray, initial_rho,
                               cam: CameraConfig) -> jnp.ndarray:
    """Pixel -> 6-vector inverse-depth feature [r_W θ φ ρ₀] (hinv.m:1-28)."""
    uv = undistort(uvd, cam)
    fku = cam.f / cam.d
    h_lr = jnp.stack([
        -(cam.cx - uv[..., 0]) / fku,
        -(cam.cy - uv[..., 1]) / fku,
        jnp.ones_like(uv[..., 0])], axis=-1)
    n = jnp.einsum("...ij,...j->...i", quat.q2r(q_wr), h_lr)
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    theta = jnp.arctan2(nx, nz)
    phi = jnp.arctan2(-ny, jnp.sqrt(nx * nx + nz * nz))
    rho = jnp.broadcast_to(jnp.asarray(initial_rho, uvd.dtype), theta.shape)
    return jnp.concatenate(
        [r_w, theta[..., None], phi[..., None], rho[..., None]], axis=-1)
