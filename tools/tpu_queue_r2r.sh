#!/bin/sh
# r2r dispatcher: wait for the r2q queue to finish, then run the body.
cd /root/repo
mkdir -p runs/r2r
for i in $(seq 1 300); do
    if grep -q QUEUE_DONE runs/r2q/queue.log 2>/dev/null; then
        echo "r2q done at $(date); dispatching r2r" >> runs/r2r/watch.log
        sh tools/tpu_queue_r2r_body.sh
        exit 0
    fi
    sleep 120
done
echo "gave up waiting for r2q" >> runs/r2r/watch.log
