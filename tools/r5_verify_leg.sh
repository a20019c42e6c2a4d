#!/bin/sh
# r5 verify-axis leg: does scaling min_inliers to the keypoint budget
# (10/12 at 48x64 -> 40/48 at 96x128) fix the fixed-0.9 poisoning on
# its own (no threshold change)? Waits for the clean pytest to exit.
cd /root/repo
LOG=runs/r5/verify_leg.log
: > $LOG
while ps -p "$(cat /tmp/pytest.pid 2>/dev/null)" >/dev/null 2>&1; do sleep 60; done
echo "=== w32u fixed-0.9 min_inliers=40  $(date +%H:%M:%S)" >> $LOG
timeout -k 30 7200 python -u examples/run_loop_closure.py \
    --frontend pixels --traj pan --frames 150 --ensemble 2 --cpu \
    --vss-width 32 --vss-hw 96 128 --min-inliers 40 \
    --json runs/r5/loop_e2e_w32u_inl40.json >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
[ -s runs/r5/loop_e2e_w32u_inl40.json ] && git add -f runs/r5/loop_e2e_w32u_inl40.json
git add -f runs/r5/verify_leg.log
git commit -q -m "r5 artifacts: verify-axis leg (min_inliers scaled to keypoint budget)" >> $LOG 2>&1 || echo "commit FAILED" >> $LOG
echo "VERIFY_LEG_DONE" >> $LOG
