"""Retrieval evaluation: precision-recall / AUC harness.

Behavior source: "CALC 2.0"/test_net.py — build a memory database of
descriptors, query each live image by cosine similarity (test_net.py:169),
optionally re-rank the top-K by local-keypoint geometric verification
("G-CALC2", test_net.py:176-206), then report precision-recall and AUC
(test_net.py:255-268). The reference evaluates on CampusLoopDataset
live/memory pairs where ground truth is the index pairing; the synthetic
pair generator below reproduces that protocol (two views of the same scene
per index).

sklearn is not a baked dependency; precision_recall_curve/AUC are the
standard definitions implemented on numpy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.models import keypoints as kp_mod
from ekf_slam_tpu.models import loopclosure as lc


def cosine_similarity_matrix(d_live: jnp.ndarray,
                             d_mem: jnp.ndarray) -> jnp.ndarray:
    """(L, D) x (M, D) -> (L, M), mapped from [-1,1] to [0,1] like the
    reference (calc2.py:330)."""
    return (1.0 + d_live @ d_mem.T) / 2.0


def nn_retrieval_scores(sim: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-neighbor retrieval where the correct answer is the diagonal
    (calc2.py:336-357): returns (labels, scores) over live images."""
    ids = np.argmax(sim, axis=1)
    scores = sim[np.arange(sim.shape[0]), ids]
    labels = (ids == np.arange(sim.shape[0])).astype(np.int32)
    return labels, scores


def precision_recall_curve(labels: np.ndarray, scores: np.ndarray):
    """Standard PR curve (descending-threshold sweep). Returns
    (precision, recall, thresholds)."""
    order = np.argsort(-scores)
    labels = np.asarray(labels)[order]
    scores = np.asarray(scores)[order]
    tp = np.cumsum(labels)
    fp = np.cumsum(1 - labels)
    total_pos = max(int(labels.sum()), 1)
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / total_pos
    return (np.concatenate([[1.0], precision]),
            np.concatenate([[0.0], recall]), scores)


def pr_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Area under the PR curve (trapezoid over recall)."""
    p, r, _ = precision_recall_curve(labels, scores)
    return float(np.trapezoid(p, r))


def geometric_rerank(d_live, kp_live: kp_mod.Keypoints, d_mem,
                     kp_mem: kp_mod.Keypoints, cfg: lc.LoopConfig,
                     key: jax.Array, top_k: int = 7):
    """G-CALC2 scoring (test_net.py:176-206): per live image, verify the
    top-K cosine candidates by keypoint ratio-test + fundamental RANSAC and
    keep the candidate with most inliers. Returns (labels, scores) where
    score = cosine sim of the geometric winner."""
    sim = cosine_similarity_matrix(d_live, d_mem)
    L = sim.shape[0]

    @jax.jit
    def verify_all(sim, descr_live, yx_live, descr_mem, yx_mem, keys):
        """One fused program: vmap over live images x top-K candidates —
        L*top_k ratio-test + fundamental-RANSAC verifications batched on
        device (replaces the round-1 per-image Python loop)."""
        cand = jnp.argsort(-sim, axis=1)[:, :top_k]          # (L, top_k)

        def one(di, yi, cand_i, key_i):
            def inl(c, kk):
                idx2, ok = kp_mod.ratio_test_matches(
                    di, descr_mem[c], cfg.ratio)
                return lc.fundamental_ransac(yi, yx_mem[c][idx2], ok,
                                             cfg, kk)
            counts = jax.vmap(inl)(cand_i, jax.random.split(key_i, top_k))
            best = jnp.argmax(counts)
            return cand_i[best], counts[best]

        return jax.vmap(one)(descr_live, yx_live, cand, keys)

    cids, inliers = verify_all(sim, kp_live.descr, kp_live.yx,
                               kp_mem.descr, kp_mem.yx,
                               jax.random.split(key, L))
    cids = np.asarray(cids)
    sim = np.asarray(sim)
    labels = (cids == np.arange(L)).astype(np.int32)
    scores = (sim[np.arange(L), cids]
              * (np.asarray(inliers) >= cfg.min_inliers))
    return labels, scores.astype(np.float64)


def evaluate_pairs(model, variables, live_images, mem_images,
                   rng: Optional[jax.Array] = None, batch: int = 8):
    """Descriptor-level PR evaluation of live/memory pairs — the
    `calc2.py --mode pr` protocol. Returns dict with auc + curves."""
    rng = jax.random.key(0) if rng is None else rng

    @jax.jit
    def embed(imgs):
        outs = model.apply(variables, imgs, train=False,
                           rngs={"reparam": rng}, descriptor_only=True)
        return outs["descriptor"]

    def embed_all(imgs):
        ds = [embed(imgs[i:i + batch]) for i in range(0, imgs.shape[0],
                                                      batch)]
        return jnp.concatenate(ds, axis=0)

    d_live = embed_all(live_images)
    d_mem = embed_all(mem_images)
    sim = np.asarray(cosine_similarity_matrix(d_live, d_mem))
    labels, scores = nn_retrieval_scores(sim)
    p, r, _ = precision_recall_curve(labels, scores)
    return {"auc": pr_auc(labels, scores), "precision": p, "recall": r,
            "labels": labels, "scores": scores, "similarity": sim}
