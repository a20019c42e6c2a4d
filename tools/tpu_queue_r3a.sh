#!/bin/sh
# r3a queue: the f32 parity-config dig (VERDICT r3 task 1) + the bf16-P
# drift quantification legs (task 2). All sim-path runs at the bench
# defaults (B=256, CAP=100, M=24, NHYP=64) with BENCH_PSTORE=f32 unless
# noted. Ablations mirror the r2n protocol but ON THE F32 PROGRAM —
# the f32 stage split is what designs the round-3 fix.
cd /root/repo
mkdir -p runs/r3a
LOG=runs/r3a/queue.log
: > $LOG

run() {
    echo "=== $1" >> $LOG
    shift
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "f32 baseline reconfirm" BENCH_PSTORE=f32
run "f32 ablate li,hi"      BENCH_PSTORE=f32 EKF_ABLATE=li,hi
run "f32 ablate tail"       BENCH_PSTORE=f32 EKF_ABLATE=tail
run "f32 ablate lin2,s1"    BENCH_PSTORE=f32 EKF_ABLATE=lin2,s1
run "f32 ablate ransac"     BENCH_PSTORE=f32 EKF_ABLATE=ransac
run "f32 ablate init"       BENCH_PSTORE=f32 EKF_ABLATE=init
run "f32 ablate predict"    BENCH_PSTORE=f32 EKF_ABLATE=predict
run "f32 B=128"             BENCH_PSTORE=f32 BENCH_BATCH=128
run "f32 B=384"             BENCH_PSTORE=f32 BENCH_BATCH=384
run "f32 B=512"             BENCH_PSTORE=f32 BENCH_BATCH=512
run "f32 strict float32 dots" BENCH_PSTORE=f32 EKF_COV_PRECISION=float32
run "f32 cholesky gain"     BENCH_PSTORE=f32 BENCH_GAIN=cholesky

echo "=== drift leg bf16 (fast mode)" >> $LOG
timeout 1500 python -u tools/measure_pstore_drift.py bf16 >> $LOG 2>&1
echo "=== drift leg f32 (parity mode)" >> $LOG
timeout 1500 python -u tools/measure_pstore_drift.py f32 >> $LOG 2>&1
echo "=== drift leg f64 (CPU oracle-dtype)" >> $LOG
timeout 3000 python -u tools/measure_pstore_drift.py f64 >> $LOG 2>&1
echo "=== drift compare" >> $LOG
python -u tools/measure_pstore_drift.py compare >> $LOG 2>&1

echo "QUEUE_DONE" >> $LOG
