#!/bin/sh
# Detached harvester for the r3p queue: only committed state survives a
# host recycle (runs/ is gitignored — exactly how the original r3n/r3o
# artifacts died), so force-commit the small result artifacts the moment
# each queue stage lands. Checkpoints stay uncommitted (large).
cd /root/repo
L=runs/r3p/queue.log

while ! grep -q TRAIN_DONE "$L" 2>/dev/null; do sleep 60; done
git add -f runs/r3p/queue.log runs/r3p/severity_sweep_sevtrained.json \
    runs/calc2_r3sev/calc2_metrics.json 2>/dev/null
git diff --cached --quiet || \
    git commit -q -m "r3p artifacts: severity-trained w32 run + severity sweep (raw)"

while ! grep -q QUEUE_DONE "$L" 2>/dev/null; do sleep 60; done
git add -f runs/r3p/queue.log
git diff --cached --quiet || \
    git commit -q -m "r3p artifacts: batch re-sweep bench log (raw)"
