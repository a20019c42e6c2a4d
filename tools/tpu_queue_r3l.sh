#!/bin/sh
# r3l queue: InfoNCE tau=0.1 (SimCLR-range temperature). The tau=0.01
# run (runs/r3h) ACHIEVED in-batch separation (sim_pos 0.891 > sim_neg
# 0.836 by step 4000) yet INVERTED eval retrieval (PR-AUC 0.065; true-
# pair median 0.761 below impostor p99 0.954) and wrecked the keypoint
# stage (G-CALC2 0.21) — early grad_norm 95-145 vs the triplet's ~1.
# tau=0.1 keeps the near-duplicate gradient concentration with 10x
# softer logits. If this also fails, the negative-lift story is closed
# as explained-and-documented (3 measured experiments).
cd /root/repo
mkdir -p runs/r3l
LOG=runs/r3l/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3m/queue.log 2>/dev/null; do sleep 60; done

echo "=== calc2 w32 infonce tau=0.1 train-aliasing=4 + sweep" >> $LOG
timeout 7200 python -u examples/calc2_bundled_run.py \
    --steps 4000 --width 32 --batch 8 --images 2048 \
    --sim-objective infonce --sim-tau 0.1 \
    --train-aliasing 4 --aliasing 4 --aliasing-sweep 2,4,8,16 \
    --places 64 --out runs/calc2_r3infonce_t01 >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
