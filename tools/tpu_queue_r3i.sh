#!/bin/sh
# r3i queue: reference-scale VSS step retry. r3h's f32+remat leg
# compiled (temp 15.46 GiB) but RESOURCE_EXHAUSTED at runtime — args
# (0.14) + outputs (0.11) + runtime reserve pushed past 15.75 GiB.
# Two new levers: donate the train state (outputs alias inputs) and
# the bf16 activation path (the TPU-idiomatic training dtype).
# Waits for the r3h infonce run to release the chip.
cd /root/repo
mkdir -p runs/r3i
LOG=runs/r3i/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3h/queue.log 2>/dev/null; do sleep 60; done

echo "=== vss fullscale f32 + remat + donated state" >> $LOG
env VSS_DTYPE=float32 timeout 1500 python -u tools/vss_fullscale_step.py >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "=== vss fullscale bf16 + remat + donated state" >> $LOG
timeout 1500 python -u tools/vss_fullscale_step.py >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
