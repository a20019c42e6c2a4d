#!/bin/sh
# r3f queue: the CALC2 aliasing round (VERDICT r3 task 3) — retrain with
# archetype-GROUPED batches (--train-aliasing 4) so hard-negative mining
# sees aliased siblings, then the 2/4/8/16 difficulty sweep (the r2q run
# lost to a host recycle). Width 32, 4000 steps — the r2run4 protocol,
# so the trained-lift comparison is apples-to-apples.
cd /root/repo
mkdir -p runs/r3f
LOG=runs/r3f/queue.log
: > $LOG

echo "=== calc2 w32 train-aliasing=4 + sweep 2,4,8,16" >> $LOG
timeout 7200 python -u examples/calc2_bundled_run.py \
    --steps 4000 --width 32 --batch 8 --images 2048 \
    --train-aliasing 4 --aliasing 4 --aliasing-sweep 2,4,8,16 \
    --places 64 --out runs/calc2_r3alias >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
