#!/bin/sh
# r3c queue: f32-program re-litigation of the layout-form A/Bs that lost
# on the bf16 program (docs/BENCH.md r2) — the r3b HLO dump shows the
# f32 step pays ~14 ms/frame of estimated P-relayout copies that are
# half-price under bf16 storage: 2x flat batch-minor copies
# (measurement.py:282 flatgather), 1x full-P batch-minor copy + slice
# (mapman.py:491 rho_var gather + :554 slotdot). All runs at the bench
# defaults (B=256, CAP=100, M=24, NHYP=64) with BENCH_PSTORE=f32.
cd /root/repo
mkdir -p runs/r3c
LOG=runs/r3c/queue.log
: > $LOG

run() {
    echo "=== $1" >> $LOG
    shift
    env BENCH_PSTORE=f32 "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "sdiag dotsel"            EKF_SDIAG=dotsel
run "sdiag reduce"            EKF_SDIAG=reduce
run "mgrows rowsel"           EKF_MGROWS=rowsel
run "defer tail"              EKF_DEFER=1
run "stagger 4"               BENCH_STAGGER=4
run "dotsel + rowsel"         EKF_SDIAG=dotsel EKF_MGROWS=rowsel
run "dotsel + defer"          EKF_SDIAG=dotsel EKF_DEFER=1

echo "QUEUE_DONE" >> $LOG
