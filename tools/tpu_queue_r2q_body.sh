#!/bin/sh
# r2q body: CALC2 width-32 aliased run with the difficulty-curve sweep
# (BACKLOG validation item: aliasing degree 2/4/8/16 — plain retrieval
# vs G-CALC2 re-rank per group). ~1h train on the tunneled v5e + evals.
cd /root/repo
LOG=runs/r2q/queue.log
: > $LOG
echo "=== calc2 w32 aliased run + sweep 2,4,8,16 (timeout 9000)" >> $LOG
timeout 9000 python -u examples/calc2_bundled_run.py \
    --steps 4000 --width 32 --images 2048 --places 64 \
    --aliasing 4 --aliasing-sweep 2,4,8,16 \
    --out runs/calc2_alias_sweep >> $LOG 2>&1
echo "QUEUE_DONE" >> $LOG
