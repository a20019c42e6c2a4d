#!/bin/sh
# r3g queue: (1) CLEAN reconfirm of the f32 winner combo — the r3e
# 10,187.1 was measured while a CALC2 training shared the host/TPU
# (contention caveat, CLAUDE.md) — now via the new bench.py f32-mode
# defaults; (2) numerics gate under the combo; (3) reference-scale VSS
# step proof with the VSS_D2S=convt lowering (the r3d reshape form
# OOMed); (4) headline bf16 + pixels reconfirms for the round record.
cd /root/repo
mkdir -p runs/r3g
LOG=runs/r3g/queue.log
: > $LOG

run() {
    echo "=== $1" >> $LOG
    shift
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "f32 defaults (defer+rowsel+dotsel) rep1" BENCH_PSTORE=f32
run "f32 defaults rep2"                       BENCH_PSTORE=f32

echo "=== check_tpu_numerics under the f32 combo" >> $LOG
env EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel \
    timeout 1500 python -u tools/check_tpu_numerics.py >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "=== vss fullscale step (width 32, 192x256, batch 12, d2s=convt)" >> $LOG
timeout 1500 python -u tools/vss_fullscale_step.py >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

run "headline bf16 defaults reconfirm"
run "pixels defaults reconfirm"        BENCH_MODE=pixels

echo "QUEUE_DONE" >> $LOG
