#!/bin/sh
# r5 auto-threshold legs: the per-run calibration (--sim-threshold 0)
# at the full pan protocol for all three models + the trained model
# under cross-season stress. 2 seeds each (compare per-seed against
# the 4-seed fixed-threshold tables). Waits for THR_SWEEP_DONE.
cd /root/repo
LOG=runs/r5/auto_legs.log
: > $LOG
while ! grep -q THR_SWEEP_DONE runs/r5/thr_sweep.log 2>/dev/null; do sleep 120; done
leg() {
    name=$1; shift
    echo "=== auto leg $name  $(date +%H:%M:%S)" >> $LOG
    timeout -k 30 7200 python -u examples/run_loop_closure.py \
        --frontend pixels --traj pan --frames 150 --ensemble 2 --cpu \
        --sim-threshold 0 --json runs/r5/loop_e2e_$name.json "$@" >> $LOG 2>&1
    echo "--- $name rc=$? at $(date +%H:%M:%S)" >> $LOG
}
CKPT=runs/calc2_r5ctl/ckpt_final
leg auto_w8_pan --vss-width 8
leg auto_w32u_pan --vss-width 32 --vss-hw 96 128
leg auto_w32t_pan --ckpt $CKPT --vss-width 32 --vss-hw 96 128
leg auto_w32t_pan_sev1 --ckpt $CKPT --vss-width 32 --vss-hw 96 128 --lc-severity 1.0
for f in runs/r5/loop_e2e_auto_*.json; do [ -s "$f" ] && git add -f "$f"; done
git add -f runs/r5/auto_legs.log
git commit -q -m "r5 artifacts: auto-calibrated-threshold loop e2e legs (w8/w32u/w32t/w32t+sev1)" >> $LOG 2>&1 || echo "commit FAILED" >> $LOG
echo "AUTO_LEGS_DONE" >> $LOG
