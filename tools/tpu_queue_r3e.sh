#!/bin/sh
# r3e queue: f32 winning-form COMPOSITIONS (r3c singles: rowsel +3.6%,
# defer +2.8%, dotsel +0.9%; stagger/reduce lose) + cap-sizing. Decides
# the f32-mode trace-time form defaults and the final headline config.
cd /root/repo
mkdir -p runs/r3e
LOG=runs/r3e/queue.log
: > $LOG

run() {
    echo "=== $1" >> $LOG
    shift
    env BENCH_PSTORE=f32 "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "defer + rowsel"                EKF_DEFER=1 EKF_MGROWS=rowsel
run "defer + rowsel + dotsel"       EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel
run "defer + rowsel + dotsel + rhovar" EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel EKF_RHOVAR=rows
run "combo + M=20"                  EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel EKF_RHOVAR=rows BENCH_M=20
run "combo + B=320"                 EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel EKF_RHOVAR=rows BENCH_BATCH=320

echo "QUEUE_DONE" >> $LOG
