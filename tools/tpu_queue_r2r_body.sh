#!/bin/sh
# r2r body: k-chain image-stagger follow-ups after the r2q probes
# (four 16-chains WON at 2,535.1 = +9.1% over unstaggered descriptor).
cd /root/repo
LOG=runs/r2r/queue.log
: > $LOG
echo "=== pixels BENCH_STAGGER=8 BENCH_PIXB=128 (eight 16-chains)" >> $LOG
BENCH_MODE=pixels BENCH_STAGGER=8 BENCH_PIXB=128 timeout 1500 python bench.py >> $LOG 2>&1
echo "=== pixels BENCH_STAGGER=4 BENCH_PIXB=64 MATCHER=ncc (NCC best config)" >> $LOG
BENCH_MODE=pixels BENCH_STAGGER=4 BENCH_PIXB=64 BENCH_MATCHER=ncc timeout 1500 python bench.py >> $LOG 2>&1
echo "=== sim headline reconfirmation (default forms)" >> $LOG
timeout 1500 python bench.py >> $LOG 2>&1
echo "QUEUE_DONE" >> $LOG
