"""Trained-vs-untrained retrieval across appearance severity — the
realistic (non-flip, non-saturated) protocol for measuring training value.

Round-2 review point: the headline trained lift leaned on the mirror-flip
protocol, while the realistic revisit protocol was saturated (untrained
0.97+) and the aliasing protocol showed a diagnosed NEGATIVE lift. The
remaining axis is appearance severity (augment.seasonal_change — the
cross-season model of test_net.py's CampusLoop pairs): independent
scenes, eval_view viewpoint change, increasing appearance change. This
sweeps severity for an untrained model vs a trained checkpoint and
reports plain-retrieval PR-AUC per point.

    python tools/eval_severity_sweep.py --run runs/calc2_fullscale \
        --width 32 --hw 192 256 --severities 0,1,1.5,2,2.5 [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training output dir")
    ap.add_argument("--ckpt", default="ckpt_final")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(192, 256))
    ap.add_argument("--places", type=int, default=32)
    ap.add_argument("--severities", default="0,1,1.5,2,2.5")
    ap.add_argument("--aliasing", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from calc2_bundled_run import eval_places
    from ekf_slam_tpu.models import train
    from ekf_slam_tpu.models.vss import VSSConfig

    # Guard: a failed upstream training leg must be reported, not cascade
    # as a raw orbax traceback (ADVICE r3: runs/r3p/queue.log crashed here
    # on a never-written checkpoint after the train leg was watchdog-killed).
    ckpt_path = os.path.join(args.run, args.ckpt)
    if not os.path.isdir(ckpt_path):
        print(f"SWEEP_SKIPPED: checkpoint {ckpt_path} does not exist "
              f"(upstream training leg failed?)", flush=True)
        sys.exit(2)

    hw = tuple(args.hw)
    model = train.create_model(VSSConfig(width=args.width))
    tcfg = train.TrainConfig(batch_size=8, image_hw=hw)
    template = train.init_state(model, tcfg, jax.random.key(tcfg.seed))
    vars0 = {"params": template.params,
             "batch_stats": template.batch_stats}
    state = train.restore_checkpoint(os.path.join(args.run, args.ckpt),
                                     template)
    vars1 = {"params": state.params, "batch_stats": state.batch_stats}

    rows = []
    for s in [float(x) for x in args.severities.split(",") if x]:
        t0 = time.time()
        ev0, _, _ = eval_places(model, vars0, args.places, hw,
                                jax.random.key(5), severity=s,
                                aliasing=args.aliasing)
        ev1, _, _ = eval_places(model, vars1, args.places, hw,
                                jax.random.key(5), severity=s,
                                aliasing=args.aliasing)
        row = {"severity": s, "pr_auc_untrained": float(ev0["auc"]),
               "pr_auc_trained": float(ev1["auc"]),
               "lift": float(ev1["auc"] - ev0["auc"]),
               "eval_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"severity {s:>4}: untrained {row['pr_auc_untrained']:.4f} "
              f"trained {row['pr_auc_trained']:.4f} "
              f"lift {row['lift']:+.4f} ({row['eval_s']:.0f}s)",
              flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"run": args.run, "ckpt": args.ckpt,
                       "width": args.width, "hw": list(hw),
                       "places": args.places, "rows": rows}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
