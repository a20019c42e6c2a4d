"""PR-evaluation harness + online loop-runner tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.models import evaluate, loop_runner, loopclosure as lc
from ekf_slam_tpu.models import train
from ekf_slam_tpu.models.vss import VSSConfig


def test_precision_recall_and_auc_known_case():
    # Perfect classifier: labels sorted by score.
    labels = np.array([1, 1, 1, 0, 0])
    scores = np.array([0.9, 0.8, 0.7, 0.3, 0.1])
    auc = evaluate.pr_auc(labels, scores)
    assert auc > 0.99
    # Inverted classifier is poor.
    auc_bad = evaluate.pr_auc(labels, -scores)
    assert auc_bad < 0.75


def test_nn_retrieval_diagonal_protocol():
    sim = np.eye(4) * 0.9 + 0.05
    labels, scores = evaluate.nn_retrieval_scores(sim)
    assert labels.sum() == 4
    np.testing.assert_allclose(scores, 0.95)


def test_evaluate_pairs_untrained_vs_structured():
    """Live/memory pairs that are near-duplicates must retrieve correctly
    even with an untrained network (descriptors are deterministic features
    of the image)."""
    model = train.create_model(VSSConfig(width=8))
    tcfg = train.TrainConfig(batch_size=2, image_hw=(32, 32))
    state = train.init_state(model, tcfg, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mem = jax.random.uniform(jax.random.key(1), (6, 32, 32, 3))
    live = jnp.clip(mem + 0.01 * jax.random.normal(jax.random.key(2),
                                                   mem.shape), 0, 1)
    out = evaluate.evaluate_pairs(model, variables, live, mem, batch=3)
    assert out["auc"] > 0.9, out["auc"]
    assert out["similarity"].shape == (6, 6)


def test_online_loop_runner_revisit():
    """Feeding the same frames twice: the second pass must declare loops
    against the first pass and pull the pose toward the stored one."""
    model = train.create_model(VSSConfig(width=8))
    tcfg = train.TrainConfig(batch_size=2, image_hw=(32, 32))
    state = train.init_state(model, tcfg, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.uniform(jax.random.key(3), (4, 32, 32, 3))
    images = jnp.concatenate([frames, frames], axis=0)      # revisit
    lcfg = lc.LoopConfig(capacity=16, top_k=2, exclude_recent=3, min_db=3,
                         sim_threshold=0.9, min_inliers=8,
                         ransac_hypotheses=8, consistency_count=2,
                         consistency_window=2)
    x0 = jnp.zeros(13).at[3].set(1.0)
    P0 = jnp.eye(13) * 0.1
    db, x, P, outs = loop_runner.run_online(
        model, variables, images, x0, P0, lcfg, jax.random.key(4))
    assert int(db.count) == 8
    assert bool(jnp.any(outs.declared)), outs
    # Loops must point back at the first pass (ids 0..3).
    declared_ids = np.asarray(outs.match_id)[np.asarray(outs.declared)]
    assert np.all(declared_ids <= 3)
