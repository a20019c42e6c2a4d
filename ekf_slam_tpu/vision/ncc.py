"""Normalized cross-correlation patch matching over a gated search window.

Behavior sources:
* crosscorr.m:1-27 — zero-mean NCC of equal-size patches (the legacy
  matching path the reference kept; BASELINE.json configs[3] names it).
* matching.m:16-42 — per-feature search inside the ±2σ innovation ellipse
  with the χ²(2,95%) gate; candidate accepted by descriptor/appearance
  score.

TPU redesign: per-feature dynamic search rectangles (matching.m:21-27)
become ONE static (2R+1)² search window per feature; positions outside the
actual χ² ellipse are masked. The NCC over all offsets for all features is
a batched sliding-window reduction — extracted windows via dynamic slices,
correlation via einsum on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ekf_slam_tpu.filter.association import mahalanobis2


def extract_patch(img: jnp.ndarray, center_uv: jnp.ndarray,
                  half: int) -> jnp.ndarray:
    """(2h+1)² patch around (u, v) with border clamping. Traced center."""
    H, W = img.shape
    size = 2 * half + 1
    u0 = jnp.clip(jnp.round(center_uv[0]).astype(jnp.int32) - half,
                  0, W - size)
    v0 = jnp.clip(jnp.round(center_uv[1]).astype(jnp.int32) - half,
                  0, H - size)
    return jax.lax.dynamic_slice(img, (v0, u0), (size, size))


def ncc_scores(window: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean NCC of `template` (t, t) against every offset of `window`
    ((t+2R) x (t+2R)) -> (2R+1, 2R+1) scores in [-1, 1] (crosscorr.m:14-27).
    """
    t = template.shape[-1]
    R2 = window.shape[-1] - t + 1
    tm = template - jnp.mean(template)
    tnorm = jnp.sqrt(jnp.sum(tm * tm) + 1e-12)

    # All sliding patches: (R2, R2, t, t) via gather of static offsets.
    idx = jnp.arange(R2)
    patches = jax.vmap(
        lambda dv: jax.vmap(
            lambda du: jax.lax.dynamic_slice(window, (dv, du), (t, t))
        )(idx)
    )(idx)
    pmean = jnp.mean(patches, axis=(-2, -1), keepdims=True)
    pm = patches - pmean
    pnorm = jnp.sqrt(jnp.sum(pm * pm, axis=(-2, -1)) + 1e-12)
    corr = jnp.einsum("abij,ij->ab", pm, tm)
    return corr / (pnorm * tnorm)


def match_feature(img: jnp.ndarray, template: jnp.ndarray,
                  h_pred: jnp.ndarray, S: jnp.ndarray, chi2_gate: float,
                  search_radius: int, min_ncc: float):
    """One feature's NCC search (matching.m re-design).

    img: (H, W) grayscale in [0,1]; template: (t, t) predicted appearance;
    h_pred: (2,) predicted pixel; S: (2, 2) innovation covariance.
    Returns (z (2,), score (), found ()).
    """
    t = template.shape[-1]
    half_t = t // 2
    win = extract_patch(img, h_pred, search_radius + half_t)
    scores = ncc_scores(win, template)                   # (2R+1, 2R+1)
    R = search_radius
    d = jnp.arange(-R, R + 1, dtype=img.dtype)
    du, dv = jnp.meshgrid(d, d, indexing="xy")
    nu = jnp.stack([du, dv], axis=-1)                    # offset = innovation
    gate = mahalanobis2(nu, S) < chi2_gate               # χ² ellipse mask
    masked = jnp.where(gate, scores, -jnp.inf)
    best = jnp.argmax(masked)
    by, bx = best // scores.shape[1], best % scores.shape[1]
    score = masked[by, bx]
    z = h_pred + jnp.stack([d[bx], d[by]])
    found = jnp.isfinite(score) & (score > min_ncc)
    return z, jnp.where(jnp.isfinite(score), score, -1.0), found


def match_all(img: jnp.ndarray, templates: jnp.ndarray, h_pred: jnp.ndarray,
              S: jnp.ndarray, visible: jnp.ndarray, chi2_gate: float,
              search_radius: int, min_ncc: float):
    """vmapped over CAP features. Returns (z (CAP,2), score, found)."""
    z, score, found = jax.vmap(
        lambda tmpl, h, s: match_feature(
            img, tmpl, h, s, chi2_gate, search_radius, min_ncc)
    )(templates, h_pred, S)
    return z, score, found & visible
