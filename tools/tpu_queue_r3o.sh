#!/bin/sh
# r3o queue: batch re-sweep after the r3 f32 form changes. Round-2
# lesson (docs/BACKLOG.md #4): the batch optimum MOVES after any
# update-cost change (M=48->24 moved it 512->256). The f32 program's
# defer+rowsel+dotsel combo changed update cost again; re-probe around
# the 256 default on both storage programs.
cd /root/repo
mkdir -p runs/r3o
LOG=runs/r3o/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3n/queue.log 2>/dev/null; do sleep 60; done

run() {
    echo "=== $1" >> $LOG
    shift
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "f32 B=128"  BENCH_PSTORE=f32 BENCH_BATCH=128
run "f32 B=192"  BENCH_PSTORE=f32 BENCH_BATCH=192
run "f32 B=384"  BENCH_PSTORE=f32 BENCH_BATCH=384
run "bf16 B=192" BENCH_BATCH=192
run "bf16 B=384" BENCH_BATCH=384

echo "QUEUE_DONE" >> $LOG
