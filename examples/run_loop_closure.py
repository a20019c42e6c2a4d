"""SLAM + CALC2 loop closure, end to end (BASELINE.json configs[4]).

The camera flies an out-and-back loop over a synthetic landmark field. The
EKF engine tracks from ground-truth-associated observations (drifting over
time); every frame is also rendered to pixels and pushed through the CALC2
loop-closure stack (descriptor -> ring DB -> retrieval -> geometric verify
-> temporal consistency). When a loop fires, the stored pose of the matched
frame feeds the filter as a position measurement (filter/loop_fusion.py) —
the integration the reference leaves as a text file
(close_kitti_loops.py:141-143, SURVEY.md §1).

  python examples/run_loop_closure.py --frames 60 --out /tmp/loop_demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def loop_trajectory(cfg, frames):
    """Out-and-back constant-speed trajectory: drift accumulates on the way
    out, the way back revisits the outbound viewpoints."""
    from ekf_slam_tpu.filter import motion
    half = frames // 2
    x = jnp.zeros(13).at[3].set(1.0)
    v_out = jnp.array([0.004, 0.0, 0.006])
    xs = []
    for t in range(frames):
        v = v_out if t < half else -v_out
        x = x.at[7:10].set(v)
        x = motion.fv(x, cfg.filter)
        xs.append(x)
    return jnp.stack(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="/tmp/loop_demo")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ekf_slam_tpu.config import EngineConfig, MapConfig, SimConfig
    from ekf_slam_tpu.filter import engine, loop_fusion
    from ekf_slam_tpu.filter.state import init_state
    from ekf_slam_tpu.models import keypoints as kp_mod
    from ekf_slam_tpu.models import loopclosure as lc
    from ekf_slam_tpu.models import train
    from ekf_slam_tpu.models.vss import VSSConfig
    from ekf_slam_tpu.sim import scene as sim_scene
    from ekf_slam_tpu.utils.checkpoint import dump_trajectory
    from ekf_slam_tpu.vision import frontend

    os.makedirs(args.out, exist_ok=True)
    cfg = EngineConfig(
        map=MapConfig(capacity=48, min_features_in_image=16,
                      max_new_per_step=16),
        sim=SimConfig(num_landmarks=64, depth_min=2.0,
                      pixel_noise_std=1.5))
    T = args.frames

    scn = sim_scene.make_scene(jax.random.key(0), cfg)
    xs = loop_trajectory(cfg, T)
    obs = jax.vmap(lambda k, x: sim_scene.observe(k, scn, x, cfg))(
        jax.random.split(jax.random.key(1), T), xs)

    # CALC2 stack (untrained weights: descriptors are still deterministic
    # functions of the image, so revisits retrieve; training sharpens it).
    model = train.create_model(VSSConfig(width=8))
    tcfg = train.TrainConfig(batch_size=2, image_hw=(48, 64))
    tstate = train.init_state(model, tcfg, jax.random.key(2))
    variables = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    lcfg = lc.LoopConfig(capacity=256, top_k=3, exclude_recent=T // 4,
                         min_db=T // 4, sim_threshold=0.9, min_inliers=10,
                         ransac_hypotheses=16, consistency_count=3,
                         consistency_window=3)

    @jax.jit
    def embed(img):
        outs = model.apply(variables, img[None], train=False,
                           rngs={"reparam": jax.random.key(3)},
                           descriptor_only=True)
        kps = jax.tree.map(lambda a: a[0],
                           kp_mod.kp_descriptor(outs["c5"]))
        return outs["descriptor"][0], kps

    def _render(x):
        g = jax.image.resize(
            frontend.render_scene_image(scn, x, cfg), (48, 64), "linear")
        return jnp.repeat(g[..., None], 3, axis=-1)   # VSS wants RGB
    render = jax.jit(_render)
    step = jax.jit(engine.step, static_argnames="cfg")

    def run(with_lc: bool):
        st = engine.bootstrap(init_state(cfg),
                              jax.tree.map(lambda a: a[0], obs), cfg)
        db = None
        errs, loops, traj = [], [], []
        for t in range(T):
            o = jax.tree.map(lambda a: a[t], obs)
            st, info = step(st, o, jax.random.key(100 + t), cfg)
            if with_lc:
                img = render(xs[t])
                descr, kps = embed(img)
                if db is None:
                    db = lc.init_db(lcfg, descr.shape[0], kps.yx.shape[0],
                                    kps.descr.shape[1])
                pose = jnp.concatenate([st.x[0:3], st.x[3:7]])
                warm = int(db.count) >= lcfg.min_db
                res = lc.query(db, descr, kps, lcfg,
                               jax.random.key(200 + t))
                res = res._replace(
                    is_hypothesis=res.is_hypothesis & jnp.asarray(warm))
                db, declared, match_slot, match_frame = lc.step_temporal(
                    db, res, lcfg)
                if bool(declared):
                    # 6-DoF pose constraint against the matched frame's
                    # stored pose, noise scaled by verification quality.
                    pose_j = db.pose[int(match_slot)]
                    sp, sr = loop_fusion.loop_noise_sigmas(res.best_inliers)
                    x_new, P_new = loop_fusion.apply_loop_constraint_pose(
                        st.x, st.P, pose_j, sp, sr, jnp.asarray(True))
                    st = st.replace(x=x_new, P=P_new)
                    loops.append((t, int(match_frame)))
                db = lc.push(db, descr, kps, pose)
            traj.append(np.asarray(st.x[:13]))
            errs.append(float(jnp.linalg.norm(st.x[0:3] - xs[t][0:3])))
        return np.stack(traj), errs, loops

    traj_nolc, err_nolc, _ = run(with_lc=False)
    traj_lc, err_lc, loops = run(with_lc=True)

    dump_trajectory(os.path.join(args.out, "trajectory.npz"),
                    traj_lc, truth=np.asarray(xs))
    dump_trajectory(os.path.join(args.out, "trajectory_nolc.npz"),
                    traj_nolc, truth=np.asarray(xs))
    print(f"loops declared: {loops}")
    print("pos err no-LC (last 10):", [round(e, 4) for e in err_nolc[-10:]])
    print("pos err    LC (last 10):", [round(e, 4) for e in err_lc[-10:]])
    print(f"final err: no-LC {err_nolc[-1]:.4f} vs LC {err_lc[-1]:.4f}")
    print(f"outputs in {args.out}")


if __name__ == "__main__":
    main()
