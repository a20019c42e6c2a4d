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
# Full-batch stagger: r2o's BENCH_STAGGER=1 at BATCH=256 lost -33%
# because it halved the per-kernel batch below the measured efficiency
# point. Keep each chain AT the optimum (256) and double the total:
# the second chain exists purely to fill the serial-chain scheduling
# bubbles the r2o roofline identified as the binding constraint.
echo "=== BENCH_STAGGER=1 BENCH_BATCH=512 sim (two 256-chains)" >> $LOG
BENCH_STAGGER=1 BENCH_BATCH=512 timeout 1500 python bench.py >> $LOG 2>&1
# Same idea on the image path: PIXB optimum is 32 (64 was -34%), so
# stagger at 64 = two 32-chains (descriptor matcher, engine default).
echo "=== pixels BENCH_STAGGER=1 BENCH_PIXB=64 (two 32-chains, descriptor)" >> $LOG
BENCH_MODE=pixels BENCH_STAGGER=1 BENCH_PIXB=64 timeout 1500 python bench.py >> $LOG 2>&1
echo "QUEUE_DONE" >> $LOG
