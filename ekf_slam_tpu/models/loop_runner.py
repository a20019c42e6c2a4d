"""Online loop-closure runner — the close_kitti_loops.py pipeline, wired
into the EKF (the integration the reference leaves as a text file,
close_kitti_loops.py:141-143 / SURVEY.md §1).

Per frame (close_kitti_loops.py:100-154):
  descriptor + keypoints from the VSS network -> push to the ring DB ->
  (once the DB is warm) cosine top-K retrieval + geometric verification ->
  temporal-consistency filter -> on a declared loop, fuse the stored pose
  as an EKF position measurement (filter/loop_fusion.py).

`run_online` drives a whole sequence with one jitted per-frame function;
outputs per-frame query diagnostics (the kitti_q_times.txt / kitti_loops.txt
equivalents are returned as arrays instead of files).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ekf_slam_tpu.filter import loop_fusion
from ekf_slam_tpu.models import keypoints as kp_mod
from ekf_slam_tpu.models import loopclosure as lc


class LoopStepOut(NamedTuple):
    declared: jnp.ndarray      # () bool — loop fired this frame
    match_id: jnp.ndarray      # () int32 — matched DB frame
    inliers: jnp.ndarray       # () int32
    similarity: jnp.ndarray    # () best candidate cosine sim


def make_frame_fn(model, variables, lcfg: lc.LoopConfig,
                  loop_sigma: float = 0.05, relative_pose: bool = True,
                  mesh=None):
    """Returns a jittable fn(db, x, P, image, key) ->
    (db, x, P, LoopStepOut): embed -> push -> query -> temporal -> fuse.

    relative_pose=True fuses the full 6-DoF pose constraint (position +
    orientation of the matched frame, close_kitti_loops.py:141-143 emits
    both poses for exactly this) with noise scaled by the verification
    inlier count; False keeps the legacy 3-DoF position snap with the
    fixed `loop_sigma`.

    mesh: a jax.sharding.Mesh with a 'data' axis routes the DB through
    parallel/sharded_loopdb (capacity sharded over chips; identical
    retrieval results) — pass a db placed with sharded_loopdb.shard_db."""
    if mesh is not None:
        from ekf_slam_tpu.parallel import sharded_loopdb as sdb

    def frame(db: lc.LoopDatabase, x, P, image, key):
        outs = model.apply(variables, image[None], train=False,
                           rngs={"reparam": key}, descriptor_only=True)
        descr = outs["descriptor"][0]
        kps = jax.tree.map(lambda a: a[0], kp_mod.kp_descriptor(outs["c5"]))
        pose = jnp.concatenate([x[0:3], x[3:7]]).astype(db.pose.dtype)

        warm = db.count >= lcfg.min_db
        res = (sdb.query(db, descr, kps, lcfg, key, mesh)
               if mesh is not None else lc.query(db, descr, kps, lcfg, key))
        res = res._replace(is_hypothesis=res.is_hypothesis & warm)
        db2, declared, match_slot, match_frame = lc.step_temporal(
            db, res, lcfg)
        if mesh is not None:
            pose_j = sdb.best_pose(
                db2, jnp.clip(match_slot, 0, db2.pose.shape[0] - 1),
                mesh).astype(x.dtype)
        else:
            pose_j = db2.pose[
                jnp.clip(match_slot, 0, db2.pose.shape[0] - 1)].astype(
                x.dtype)
        if relative_pose:
            sp, sr = loop_fusion.loop_noise_sigmas(res.best_inliers)
            x2, P2 = loop_fusion.apply_loop_constraint_pose(
                x, P, pose_j, sp, sr, declared)
        else:
            x2, P2 = loop_fusion.apply_loop_constraint(
                x, P, pose_j[0:3], loop_sigma, declared)
        db3 = (sdb.push(db2, descr, kps, pose, mesh)
               if mesh is not None else lc.push(db2, descr, kps, pose))
        out = LoopStepOut(declared=declared, match_id=match_frame,
                          inliers=res.best_inliers,
                          similarity=res.similarities[0])
        return db3, x2, P2, out

    return frame


def run_online(model, variables, images: jnp.ndarray, x0, P0,
               lcfg: lc.LoopConfig, key: jax.Array,
               loop_sigma: float = 0.05):
    """Run the loop-closure pipeline over a (T, H, W, 3) image stack with a
    static filter state (pose updates only through loop constraints — the
    odometry integration lives in the SLAM engine; see examples/)."""
    frame = make_frame_fn(model, variables, lcfg, loop_sigma)
    # Probe shapes once to size the DB.
    outs = model.apply(variables, images[:1], train=False,
                       rngs={"reparam": key}, descriptor_only=True)
    kps = kp_mod.kp_descriptor(outs["c5"])
    db = lc.init_db(lcfg, outs["descriptor"].shape[1], kps.yx.shape[1],
                    kps.descr.shape[2])

    def body(carry, inp):
        db, x, P = carry
        img, k = inp
        db, x, P, out = frame(db, x, P, img, k)
        return (db, x, P), out

    keys = jax.random.split(key, images.shape[0])
    (db, x, P), outs_seq = jax.lax.scan(body, (db, x0, P0), (images, keys))
    return db, x, P, outs_seq
