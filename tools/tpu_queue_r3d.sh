#!/bin/sh
# r3d queue: (1) the EKF_RHOVAR=rows combos the r3b HLO analysis
# designed (kill the conversion path's batch-minor full-P copy — both
# consumers must move together); (2) the reference-scale VSS train-step
# proof (VERDICT r3 task 5). f32 parity program unless noted.
cd /root/repo
mkdir -p runs/r3d
LOG=runs/r3d/queue.log
: > $LOG

run() {
    echo "=== $1" >> $LOG
    shift
    env BENCH_PSTORE=f32 "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "rhovar rows"                    EKF_RHOVAR=rows
run "rhovar rows + mgrows rowsel"    EKF_RHOVAR=rows EKF_MGROWS=rowsel
run "rows + rowsel + sdiag dotsel"   EKF_RHOVAR=rows EKF_MGROWS=rowsel EKF_SDIAG=dotsel

echo "=== vss fullscale step (width 32, 192x256, batch 12)" >> $LOG
timeout 1500 python -u tools/vss_fullscale_step.py >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
