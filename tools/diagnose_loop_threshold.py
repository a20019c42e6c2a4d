"""Similarity-separation diagnostic for the r5 loop-closure legs.

The r5 trained-perception experiment (runs/r5/loop_e2e_*.json) showed
EVERY w32/96x128 variant flooding false loops at the fixed
sim_threshold=0.9 that works for w8/48x64 — including the UNTRAINED
w32. Hypothesis: the threshold is a per-model quantity (descriptor
cosine distributions shift with width/resolution/training), so a fixed
0.9 is mis-calibrated for every model except the one it was tuned on —
the same reason examples/calc2_bundled_run.py max-F1-calibrates before
its loop test (calc2_bundled_run.py:285).

This tool renders the pan-revisit sequence (the exact run_loop_closure
scene, no sensor noise), embeds every frame with a given model, and
reports the cosine bands that decide the experiment:

  genuine   query t in the revisit window vs its true counterpart
            (t-120 +- 2 frames for the 450-degree / 150-frame pan)
  aliased   the strongest NON-genuine DB entry for the same queries
            (whatever the retrieval would actually propose)
  fires@thr how many of each exceed a threshold

plus the separating threshold (midpoint of the two medians) if one
exists. Reference anchor: close_kitti_loops.py:107-109 (fixed 0.85
threshold — the reference has exactly this fragility).

  python tools/diagnose_loop_threshold.py --vss-width 8 --vss-hw 48 64
  python tools/diagnose_loop_threshold.py --vss-width 32 --vss-hw 96 128 \
      --ckpt runs/calc2_r5ctl/ckpt_final --json runs/r5/thr_diag_w32t.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--vss-width", type=int, default=8)
    ap.add_argument("--vss-hw", type=int, nargs=2, default=(48, 64))
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--thr", type=float, default=0.9)
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from run_loop_closure import make_surround_scene, pan_trajectory

    from ekf_slam_tpu.config import EngineConfig, MapConfig, SimConfig
    from ekf_slam_tpu.models import train
    from ekf_slam_tpu.models.vss import VSSConfig
    from ekf_slam_tpu.vision import frontend

    cfg = EngineConfig(
        map=MapConfig(capacity=48, min_features_in_image=16,
                      max_new_per_step=16),
        sim=SimConfig(num_landmarks=64, depth_min=2.0, depth_max=6.0,
                      pixel_noise_std=1.5))
    T = args.frames
    scn = make_surround_scene(jax.random.key(0), cfg, n_anchors=12)
    xs = pan_trajectory(cfg, T)
    render = jax.jit(frontend.render_scene_image, static_argnames="cfg")

    model = train.create_model(VSSConfig(width=args.vss_width))
    tcfg = train.TrainConfig(batch_size=2, image_hw=tuple(args.vss_hw))
    tstate = train.init_state(model, tcfg, jax.random.key(2))
    if args.ckpt:
        tstate = train.restore_checkpoint(args.ckpt, tstate)
    variables = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    hw = tuple(args.vss_hw)

    @jax.jit
    def embed(img):
        g = jax.image.resize(img, hw, "linear")
        rgb = jnp.repeat(g[..., None], 3, axis=-1)
        outs = model.apply(variables, rgb[None], train=False,
                           rngs={"reparam": jax.random.key(3)},
                           descriptor_only=True)
        return outs["descriptor"][0]

    D = np.stack([np.asarray(embed(render(scn, xs[t], cfg)))
                  for t in range(T)])
    sim = D @ D.T   # descriptors are L2-normalized

    # 450 deg over T frames -> one full turn = T * 360/450 = 0.8 T frames.
    turn = int(round(T * 360.0 / 450.0))
    genuine, aliased = [], []
    for t in range(turn, T):
        j_true = t - turn
        window = [j for j in range(0, t - T // 4)]   # exclude_recent = T//4
        if not window:
            continue
        genuine.append(max(sim[t, max(0, j_true - 2):j_true + 3]))
        others = [sim[t, j] for j in window if abs(j - j_true) > 2]
        if others:
            aliased.append(max(others))
    # Early-to-mid queries have NO genuine counterpart: their best DB hit
    # is false by construction (these are what fired at frame 40+).
    nogen = []
    for t in range(T // 4, turn):
        window = range(0, t - T // 4)
        vals = [sim[t, j] for j in window]
        if vals:
            nogen.append(max(vals))

    g, a, n = map(np.asarray, (genuine, aliased, nogen))
    out = {
        "width": args.vss_width, "hw": list(hw), "ckpt": args.ckpt,
        "genuine_p50": float(np.median(g)), "genuine_min": float(g.min()),
        "aliased_p50": float(np.median(a)), "aliased_max": float(a.max()),
        "nogenuine_p50": float(np.median(n)) if n.size else None,
        "nogenuine_max": float(n.max()) if n.size else None,
        "fires_at_thr": {
            "thr": args.thr,
            "genuine": int((g >= args.thr).sum()), "of": int(g.size),
            "aliased": int((a >= args.thr).sum()),
            "nogenuine": int((n >= args.thr).sum()) if n.size else 0,
        },
    }
    sep_floor = max(float(a.max()), float(n.max()) if n.size else -1.0)
    out["separable"] = bool(g.min() > sep_floor)
    out["separating_thr"] = float((g.min() + sep_floor) / 2) \
        if out["separable"] else None
    print(json.dumps(out, indent=1))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
