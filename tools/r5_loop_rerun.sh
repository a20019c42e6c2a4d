#!/bin/sh
# r5 loop-e2e re-run (VERDICT-r4 #1b): regenerate the r4 experiment's two
# JSONs (untrained w8, the r4 protocol) and COMMIT them; the pan leg runs
# through BENCH_MODE=loop so the fusion-win gates are exercised at the
# real protocol (VERDICT-r4 #7 done-criterion). Waits for the full test
# suite to exit first (single vCPU — serialize).
cd /root/repo
LOG=runs/r5/loop_rerun.log
: > $LOG
while ps -p "$(cat /tmp/pytest.pid 2>/dev/null)" >/dev/null 2>&1; do
    sleep 60
done
echo "=== gated pan (BENCH_MODE=loop)  $(date +%H:%M:%S)" >> $LOG
BENCH_MODE=loop BENCH_LOOP_JSON=runs/r5/loop_e2e_pan.json \
    timeout -k 30 7200 python -u bench.py >> $LOG 2>&1
echo "--- pan rc=$? at $(date +%H:%M:%S)" >> $LOG
echo "=== outback  $(date +%H:%M:%S)" >> $LOG
timeout -k 30 7200 python -u examples/run_loop_closure.py \
    --frontend pixels --traj outback --frames 150 --ensemble 4 --cpu \
    --json runs/r5/loop_e2e_outback.json >> $LOG 2>&1
echo "--- outback rc=$? at $(date +%H:%M:%S)" >> $LOG
for f in runs/r5/loop_e2e_pan.json runs/r5/loop_e2e_outback.json; do
    [ -s "$f" ] && git add -f "$f"
done
git add -f runs/r5/loop_rerun.log
git commit -q -m "r5 artifacts: loop-fusion e2e re-run (pan via gated BENCH_MODE=loop + outback)" >> $LOG 2>&1 \
    && echo committed >> $LOG || echo "commit FAILED" >> $LOG
echo "LOOP_RERUN_DONE" >> $LOG
