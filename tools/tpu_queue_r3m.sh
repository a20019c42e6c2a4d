#!/bin/sh
# r3m queue: measure ensemble ATE quantiles (bench.py ensemble_ate —
# SE(3)-aligned per-instance ATE, p50/p95/max) at the headline operating
# point in all three bench modes, to set the sim ATE p95 gate band from
# measurement (the provisional 0.30 gets replaced by 2x measured p95).
cd /root/repo
mkdir -p runs/r3m
LOG=runs/r3m/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3k/queue.log 2>/dev/null; do sleep 60; done

run() {
    echo "=== $1" >> $LOG
    shift
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "headline bf16 (ATE quantiles)"
run "f32 parity (ATE quantiles)"   BENCH_PSTORE=f32
run "pixels (ATE quantiles)"       BENCH_MODE=pixels

echo "QUEUE_DONE" >> $LOG
