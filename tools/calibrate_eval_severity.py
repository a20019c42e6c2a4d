"""Calibrate augment.seasonal_change severity: untrained-descriptor
PR-AUC on the bundled eval protocol should sit well below 1.0 so the
trained-vs-untrained lift is measurable (docs/CALC2_RUN.md)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from ekf_slam_tpu.data import synthetic_batch
    from ekf_slam_tpu.models import augment, evaluate, train
    from ekf_slam_tpu.models.vss import VSSConfig

    places = int(os.environ.get("CAL_PLACES", "48"))
    width = int(os.environ.get("CAL_WIDTH", "16"))
    hw = (96, 128)
    model = train.create_model(VSSConfig(width=width))
    tcfg = train.TrainConfig(batch_size=8, image_hw=hw)
    state0 = train.init_state(model, tcfg, jax.random.key(tcfg.seed))
    vars0 = {"params": state0.params, "batch_stats": state0.batch_stats}
    mem, _ = synthetic_batch(jax.random.key(1234), places, hw)
    for sev in (0.0, 0.5, 1.0, 1.5):
        live = augment.eval_view(jax.random.key(5), mem, severity=sev)
        out = evaluate.evaluate_pairs(model, vars0, live, mem, batch=8)
        print(f"severity={sev:.1f} untrained AUC={out['auc']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
