#!/bin/sh
# r2o queue: post-TP-refactor reconfirmation + next attribution probes.
# Run when the axon tunnel is healthy. Output: runs/r2o/queue.log
cd /root/repo
LOG=runs/r2o/queue.log
: > $LOG
echo "=== baseline sim bench (default forms)" >> $LOG
timeout 1500 python bench.py >> $LOG 2>&1
echo "=== check_tpu_numerics" >> $LOG
timeout 1500 python tools/check_tpu_numerics.py >> $LOG 2>&1
echo "=== EKF_STRIPES=predT sim A/B" >> $LOG
EKF_STRIPES=predT timeout 1500 python bench.py >> $LOG 2>&1
echo "=== EKF_JACFORM=fused sim A/B" >> $LOG
EKF_JACFORM=fused timeout 1500 python bench.py >> $LOG 2>&1
echo "=== BENCH_FUSED=on sim A/B (fused Pallas step on the lean program)" >> $LOG
BENCH_FUSED=on timeout 1500 python bench.py >> $LOG 2>&1
echo "=== BENCH_STAGGER=1 sim A/B (software-pipelined two-half driver)" >> $LOG
BENCH_STAGGER=1 timeout 1500 python bench.py >> $LOG 2>&1
echo "=== EKF_S2FORM=inc sim A/B (incremental rescue blocks)" >> $LOG
EKF_S2FORM=inc timeout 1500 python bench.py >> $LOG 2>&1
echo "=== BENCH_STAGGER=1 EKF_S2FORM=inc composed sim A/B" >> $LOG
BENCH_STAGGER=1 EKF_S2FORM=inc timeout 1500 python bench.py >> $LOG 2>&1
echo "=== pixels descriptor baseline" >> $LOG
BENCH_MODE=pixels timeout 1500 python bench.py >> $LOG 2>&1
echo "=== pixels EKF_ABLATE=winext (shared-form attribution)" >> $LOG
BENCH_MODE=pixels EKF_ABLATE=winext timeout 1500 python bench.py >> $LOG 2>&1
echo "=== pixels EKF_ABLATE=describe" >> $LOG
BENCH_MODE=pixels EKF_ABLATE=describe timeout 1500 python bench.py >> $LOG 2>&1
echo "=== pixels EKF_ABLATE=dmatch" >> $LOG
BENCH_MODE=pixels EKF_ABLATE=dmatch timeout 1500 python bench.py >> $LOG 2>&1
echo "=== pixels BENCH_STAGGER=1 (staggered image driver)" >> $LOG
BENCH_MODE=pixels BENCH_STAGGER=1 timeout 1500 python bench.py >> $LOG 2>&1
echo "QUEUE_DONE" >> $LOG
