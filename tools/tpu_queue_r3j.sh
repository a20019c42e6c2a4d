#!/bin/sh
# r3j queue: SUSTAINED training at the reference shape (VERDICT r2 #2
# "reference-scale CALC2 training"): 300 steps of the full-size model
# (width 32, batch 12, 320x320 shards random-cropped to 192x256 in-step
# — the gen_tfrecords/calc2.py contract) with remat. 200k steps stays
# out of scope on a tunneled v5e; this proves the full-size pipeline
# TRAINS (loss descends, checkpoints write, eval runs) rather than just
# stepping once. Waits for r3i (the single-step fit proof).
cd /root/repo
mkdir -p runs/r3j
LOG=runs/r3j/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3i/queue.log 2>/dev/null; do sleep 60; done

echo "=== calc2 fullscale sustained: w32 b12 320->192x256 crop, 300 steps" >> $LOG
timeout 7200 python -u examples/calc2_bundled_run.py \
    --steps 300 --width 32 --batch 12 --images 256 \
    --hw 192 256 --data-hw 320 320 --remat --dtype bfloat16 \
    --places 16 --out runs/calc2_fullscale >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
