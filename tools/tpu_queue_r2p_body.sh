#!/bin/sh
# r2p body: numerics gate re-run (r2o's was killed at timeout 1500 with
# buffered stdout lost — 6 tunnel compiles need ~40 min and python -u).
cd /root/repo
LOG=runs/r2p/queue.log
: > $LOG
echo "=== check_tpu_numerics (unbuffered, timeout 3600)" >> $LOG
timeout 3600 python -u tools/check_tpu_numerics.py >> $LOG 2>&1
echo "NUMERICS_DONE" >> $LOG
echo "QUEUE_DONE" >> $LOG
