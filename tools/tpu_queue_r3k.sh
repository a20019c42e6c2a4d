#!/bin/sh
# r3k queue: round-3 record reconfirms with the best-of-3-window bench
# timing (defends the recorded number against transient tunnel stalls).
# Waits for r3j (sustained fullscale training) to release the chip.
cd /root/repo
mkdir -p runs/r3k
LOG=runs/r3k/queue.log
: > $LOG

while ! grep -q QUEUE_DONE runs/r3j/queue.log 2>/dev/null; do sleep 60; done

run() {
    echo "=== $1" >> $LOG
    shift
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "headline bf16 defaults (best-of-3 windows)"
run "f32 parity defaults (best-of-3 windows)"  BENCH_PSTORE=f32
run "pixels defaults (best-of-3 windows)"      BENCH_MODE=pixels

echo "QUEUE_DONE" >> $LOG
