#!/bin/sh
# r2q dispatcher: wait for the r2p queue to finish, then run the r2q body.
# Body lives in tpu_queue_r2q_body.sh so it can be edited right up to
# dispatch (sh reads scripts incrementally; never edit a RUNNING script).
cd /root/repo
mkdir -p runs/r2q
for i in $(seq 1 300); do
    if grep -q QUEUE_DONE runs/r2p/queue.log 2>/dev/null; then
        echo "r2p done at $(date); dispatching r2q" >> runs/r2q/watch.log
        sh tools/tpu_queue_r2q_body.sh
        exit 0
    fi
    sleep 120
done
echo "gave up waiting for r2p" >> runs/r2q/watch.log
