#!/bin/sh
# r2p dispatcher: wait for the r2o queue to finish, then run the r2p body.
# The body lives in tpu_queue_r2p_body.sh so it can be edited right up to
# dispatch (sh reads scripts incrementally; never edit a RUNNING script).
cd /root/repo
mkdir -p runs/r2p
for i in $(seq 1 200); do
    if grep -q QUEUE_DONE runs/r2o/queue.log 2>/dev/null; then
        echo "r2o done at $(date); dispatching r2p" >> runs/r2p/watch.log
        sh tools/tpu_queue_r2p_body.sh
        exit 0
    fi
    sleep 120
done
echo "gave up waiting for r2o" >> runs/r2p/watch.log
