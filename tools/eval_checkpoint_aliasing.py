"""Evaluate saved CALC2 checkpoints on the aliased-place protocol.

The reference sweeps checkpoints by eval score (test_net.py:357-381 /
train.find_best_checkpoint); this applies the same idea to the aliasing
benchmark: a descriptor trained too long on near-duplicate negatives
overfits the positive-view augmentation (runs/r3h: in-batch sim_pos >
sim_neg achieved, yet eval retrieval INVERTED to PR-AUC 0.065) — the
useful question is whether an EARLIER checkpoint holds a positive lift.

    python tools/eval_checkpoint_aliasing.py --run runs/calc2_r3infonce \
        --width 32 --hw 96 128 --aliasing 4 [--cpu]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training output dir")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--places", type=int, default=64)
    ap.add_argument("--aliasing", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from calc2_bundled_run import eval_places
    from ekf_slam_tpu.models import train
    from ekf_slam_tpu.models.vss import VSSConfig

    hw = tuple(args.hw)
    model = train.create_model(VSSConfig(width=args.width))
    tcfg = train.TrainConfig(batch_size=8, image_hw=hw)
    template = train.init_state(model, tcfg, jax.random.key(tcfg.seed))

    # Untrained baseline (same seed as training).
    vars0 = {"params": template.params, "batch_stats": template.batch_stats}
    base, _, _ = eval_places(model, vars0, args.places, hw,
                             jax.random.key(5), aliasing=args.aliasing)
    print(f"untrained: PR-AUC {base['auc']:.4f}")

    for path in sorted(glob.glob(os.path.join(args.run, "ckpt_*"))):
        state = train.restore_checkpoint(path, template)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        ev, _, _ = eval_places(model, variables, args.places, hw,
                               jax.random.key(5), aliasing=args.aliasing)
        print(f"{os.path.basename(path)}: PR-AUC {ev['auc']:.4f} "
              f"(lift {ev['auc'] - base['auc']:+.4f})")


if __name__ == "__main__":
    main()
