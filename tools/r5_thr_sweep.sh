#!/bin/sh
# r5 follow-up: threshold sensitivity of the TRAINED loop-closure failure
# (the trained w32 declares false loops at sim_threshold 0.9 that pass
# geometric verify and poison fusion — runs/r5/loop_e2e_trained_pan.json).
# Question: is it a calibration artifact (the r4 diagnosis says trained
# cosines collapse toward 1, so 0.9 admits everything) or a deeper
# verify failure? Two thresholds, 2 seeds each (per-seed comparison
# against seeds 0-1 of the 4-seed tables). Waits for QUEUE_B_DONE.
cd /root/repo
LOG=runs/r5/thr_sweep.log
: > $LOG
while ! grep -q QUEUE_B_DONE runs/r5/queue_b.log 2>/dev/null; do sleep 120; done
CKPT=runs/calc2_r5ctl/ckpt_final
[ -d "$CKPT" ] || { echo "no ckpt" >> $LOG; exit 0; }
for THR in 0.97 0.99; do
    N=$(echo $THR | tr -d '0.')
    echo "=== trained_pan thr=$THR  $(date +%H:%M:%S)" >> $LOG
    timeout -k 30 7200 python -u examples/run_loop_closure.py \
        --frontend pixels --traj pan --frames 150 --ensemble 2 --cpu \
        --ckpt $CKPT --vss-width 32 --vss-hw 96 128 --sim-threshold $THR \
        --json runs/r5/loop_e2e_trained_pan_thr$N.json >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
done
for f in runs/r5/loop_e2e_trained_pan_thr97.json runs/r5/loop_e2e_trained_pan_thr99.json; do
    [ -s "$f" ] && git add -f "$f"
done
git add -f runs/r5/thr_sweep.log
git commit -q -m "r5 artifacts: trained loop-closure threshold sensitivity (0.97/0.99)" >> $LOG 2>&1 || echo "commit FAILED" >> $LOG
echo "THR_SWEEP_DONE" >> $LOG
