#!/bin/sh
# r2p body: numerics gate re-run (r2o's was killed at timeout 1500 with
# buffered stdout lost — 6 tunnel compiles need ~40 min and python -u).
cd /root/repo
LOG=runs/r2p/queue.log
: > $LOG
echo "=== check_tpu_numerics (unbuffered, timeout 3600)" >> $LOG
timeout 3600 python -u tools/check_tpu_numerics.py >> $LOG 2>&1
echo "NUMERICS_DONE" >> $LOG
# The r2o BENCH_FUSED=on A/B crashed: the bench default p_storage=bf16
# fails the fused gate (f32 only). Fair comparison: fused(f32) vs the
# plain XLA path at f32, SAME program shape.
echo "=== BENCH_PSTORE=f32 sim (f32 reference point, lean program)" >> $LOG
BENCH_PSTORE=f32 timeout 1500 python bench.py >> $LOG 2>&1
echo "=== BENCH_FUSED=on BENCH_PSTORE=f32 sim (fused Pallas A/B)" >> $LOG
BENCH_FUSED=on BENCH_PSTORE=f32 timeout 1500 python bench.py >> $LOG 2>&1
echo "QUEUE_DONE" >> $LOG
