"""Diagnose the negative severity-training lift (runs/calc2_r4sev).

The r4a run trained w32 for 4000 steps with train-severity 1.5 and landed
a healthy in-batch margin (sim_pos 0.50 vs sim_neg 0.25 at step 4000,
runs/calc2_r4sev/train_metrics.jsonl) — yet the eval sweep shows the
trained checkpoint LOSING to random init at every severity except 1.0
(runs/r4/severity_sweep_sevtrained.json, lift -0.14 .. -0.71). This
script isolates where the transfer breaks:

  1. progression  — untrained vs ckpt_0002000 vs ckpt_final at sev {0, 1.5}
                    (does the damage grow with training?)
  2. bn-swap      — trained params + init batch_stats and vice versa
                    (is it the BatchNorm statistics or the weights?)
  3. in-domain    — retrieval on TRAINING-style pairs (shard images,
                    positive_view + seasonal_change) for both models
                    (did it learn retrieval at all, in its own domain?)
  4. sim-structure — diag/off-diag similarity stats on the places eval
                    (collapse? inversion? appearance-dominance?)

CPU-only; every eval point costs ~10 s at w32 / 96x128 / 64 places.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))
from calc2_bundled_run import eval_places
from ekf_slam_tpu.models import augment, evaluate, train
from ekf_slam_tpu.models.vss import VSSConfig

RUN = "runs/calc2_r4sev"
HW = (96, 128)
PLACES = 64
WIDTH = 32


def sim_stats(out):
    sim = np.asarray(out["similarity"])
    eye = np.eye(sim.shape[0], dtype=bool)
    return {"diag_p50": float(np.median(sim[eye])),
            "offdiag_p50": float(np.median(sim[~eye])),
            "offdiag_p99": float(np.percentile(sim[~eye], 99)),
            "auc": float(out["auc"])}


def main():
    model = train.create_model(VSSConfig(width=WIDTH))
    tcfg = train.TrainConfig(batch_size=8, image_hw=HW)
    template = train.init_state(model, tcfg, jax.random.key(tcfg.seed))
    vars0 = {"params": template.params,
             "batch_stats": template.batch_stats}
    ck2 = train.restore_checkpoint(os.path.join(RUN, "ckpt_0002000"),
                                   template)
    ckf = train.restore_checkpoint(os.path.join(RUN, "ckpt_final"),
                                   template)
    vars2 = {"params": ck2.params, "batch_stats": ck2.batch_stats}
    varsf = {"params": ckf.params, "batch_stats": ckf.batch_stats}

    report = {}

    # --- 1. progression + 4. sim structure
    for sev in (0.0, 1.5):
        for name, v in (("untrained", vars0), ("ckpt2000", vars2),
                        ("ckpt4000", varsf)):
            out, _, _ = eval_places(model, v, PLACES, HW,
                                    jax.random.key(5), severity=sev)
            st = sim_stats(out)
            report[f"places_s{sev}_{name}"] = st
            print(f"places sev={sev} {name:10s} auc={st['auc']:.4f} "
                  f"diag_p50={st['diag_p50']:.3f} "
                  f"offdiag_p50={st['offdiag_p50']:.3f} "
                  f"offdiag_p99={st['offdiag_p99']:.3f}", flush=True)

    # --- 2. BN swap at sev 1.5
    for name, v in (
        ("trainedP_initBN", {"params": ckf.params,
                             "batch_stats": template.batch_stats}),
        ("initP_trainedBN", {"params": template.params,
                             "batch_stats": ckf.batch_stats}),
    ):
        out, _, _ = eval_places(model, v, PLACES, HW,
                                jax.random.key(5), severity=1.5)
        st = sim_stats(out)
        report[f"bnswap_{name}"] = st
        print(f"bn-swap {name:18s} auc={st['auc']:.4f} "
              f"diag_p50={st['diag_p50']:.3f} "
              f"offdiag_p50={st['offdiag_p50']:.3f}", flush=True)

    # --- 3. in-domain retrieval: shard images as places, live view built
    # exactly like the training positive (positive_view + seasonal 1.5).
    from ekf_slam_tpu.data.records import ShardReader
    reader = ShardReader(os.path.join(RUN, "shards"), PLACES)
    mem = jnp.asarray(next(iter(reader))[0][:PLACES], jnp.float32)
    kp, ks = jax.random.split(jax.random.key(7))
    live = augment.positive_view(kp, mem)
    live = augment.seasonal_change(ks, live, severity=1.5)
    for name, v in (("untrained", vars0), ("ckpt4000", varsf)):
        out = evaluate.evaluate_pairs(model, v, live, mem, batch=8)
        st = sim_stats(out)
        report[f"indomain_s1.5_{name}"] = st
        print(f"in-domain sev=1.5 {name:10s} auc={st['auc']:.4f} "
              f"diag_p50={st['diag_p50']:.3f} "
              f"offdiag_p50={st['offdiag_p50']:.3f}", flush=True)

    out_path = "runs/r4/diagnose_sevtrained.json"
    os.makedirs("runs/r4", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
