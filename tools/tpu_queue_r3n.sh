#!/bin/sh
# r3n queue: close the "training value under a realistic protocol"
# question. The r3 severity sweep (docs/CALC2_RUN.md) showed clean-
# trained descriptors DEGRADE under appearance change (0.95 -> 0.55 at
# severity 2) while untrained features shrug it off — because training
# never saw appearance variation. This trains WITH the appearance model
# as positive-view augmentation (TrainConfig.aug_severity=1.5, the
# analog of the reference's cross-season training data) on independent
# scenes, then sweeps eval severity trained-vs-untrained on held-out
# places. Success = positive lift at severity >= 1.5.
cd /root/repo
mkdir -p runs/r3n
LOG=runs/r3n/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3l/queue.log 2>/dev/null; do sleep 60; done

echo "=== calc2 w32 train-severity=1.5 independent scenes" >> $LOG
timeout 7200 python -u examples/calc2_bundled_run.py \
    --steps 4000 --width 32 --batch 8 --images 2048 \
    --train-severity 1.5 --eval-severity 1.5 \
    --places 64 --out runs/calc2_r3sev >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "=== severity sweep of the severity-trained checkpoint (CPU)" >> $LOG
timeout 3600 python -u tools/eval_severity_sweep.py \
    --run runs/calc2_r3sev --width 32 --hw 96 128 --places 64 \
    --severities 0,1,1.5,2,2.5 --cpu \
    --out runs/severity_sweep_sevtrained.json >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
