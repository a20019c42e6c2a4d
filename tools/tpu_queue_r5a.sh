#!/bin/sh
# r5a queue — VERDICT-r4 #1a + #3 + #4 TPU legs:
#   1) re-dump the three bench-program compiled HLOs (the r4 roofline's
#      evidence was never committed and is gone), gzip them, and COMMIT
#      them in-script with a logged, retried git call (ADVICE-r4: no
#      silently swallowed commits). Same exact configs as r4a:120-129.
#   2) bf16 FRAMES re-sweep at the B=256 point (the optimum-moves rule
#      has never been applied to FRAMES since r2) + same-day F16 anchor.
#      F=32 needs the M cap raised to cover the longer horizon's max
#      per-update obs (r2: needs M>=25) — flagged as cap-confounded.
# Hardening: process-group kills via /bin/kill -- -PID, tunnel probe
# before every leg, 25-min mtime stall watchdog on the dump legs,
# completion markers gated on artifacts existing.
cd /root/repo
mkdir -p runs/r5
LOG=runs/r5/queue_a.log
: > $LOG

probe() {
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
    do echo "tunnel down at $(date +%H:%M:%S); sleeping 120" >> $LOG; sleep 120; done
}

commit_logged() {
    # ADVICE-r4: log the rc; retry once after a short sleep (index.lock
    # races with the interactive session).
    msg=$1; shift
    git add -f "$@" >> $LOG 2>&1
    if git commit -q -m "$msg" >> $LOG 2>&1; then
        echo "committed: $msg" >> $LOG
    else
        echo "commit FAILED (rc=$?), retrying in 30s: $msg" >> $LOG
        sleep 30
        git add -f "$@" >> $LOG 2>&1
        git commit -q -m "$msg" >> $LOG 2>&1 \
            && echo "committed on retry: $msg" >> $LOG \
            || echo "commit FAILED twice: $msg" >> $LOG
    fi
}

hlo_dump() {
    name=$1; shift
    echo "=== hlo dump $name  $(date +%H:%M:%S)" >> $LOG
    probe
    env "$@" timeout -k 30 1800 python -u tools/dump_hlo.py \
        runs/r5/hlo_$name.txt >> $LOG 2>&1 &
    DPID=$!
    (while kill -0 $DPID 2>/dev/null; do
        sleep 180
        new=$(find runs/r5 "$LOG" -newermt '-1500 seconds' 2>/dev/null | head -1)
        if [ -z "$new" ]; then
            echo "WATCHDOG: dump $name stalled 25 min, killing" >> $LOG
            /bin/kill -TERM -- -$DPID 2>/dev/null; sleep 15
            /bin/kill -KILL -- -$DPID 2>/dev/null
        fi
    done) &
    WPID=$!
    wait $DPID
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
    kill $WPID 2>/dev/null
    if [ -s runs/r5/hlo_$name.txt ]; then
        gzip -f -9 runs/r5/hlo_$name.txt
        echo "gzipped runs/r5/hlo_$name.txt.gz ($(wc -c < runs/r5/hlo_$name.txt.gz) B)" >> $LOG
    fi
}

bench_run() {
    name=$1; shift
    out=runs/r5/bench_$name.log
    echo "=== bench $name  $(date +%H:%M:%S)" >> $LOG
    probe
    env "$@" timeout -k 30 1500 python -u bench.py > "$out" 2>&1
    rc=$?
    grep '"metric"' "$out" >> $LOG
    echo "--- $name rc=$rc at $(date +%H:%M:%S)" >> $LOG
    val=$(grep -o '"value": [0-9.]*' "$out" | tail -1 | awk '{print $2}')
    # ADVICE-r4: gate the results append on rc=0, not just non-empty.
    [ "$rc" -eq 0 ] && [ -n "$val" ] && echo "$name $val" >> runs/r5/bench_results.txt
}

# --- 1) the three roofline dumps (identical configs to r4a:125-129).
hlo_dump f32 BENCH_PSTORE=f32 BENCH_BATCH=128 BENCH_FRAMES=16 \
    EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel
hlo_dump bf16 BENCH_PSTORE=bf16 BENCH_BATCH=256 BENCH_FRAMES=16
hlo_dump pixels BENCH_MODE=pixels BENCH_MATCHER=descriptor BENCH_PIXB=32 \
    BENCH_FRAMES=16
if [ -s runs/r5/hlo_f32.txt.gz ] && [ -s runs/r5/hlo_bf16.txt.gz ] \
    && [ -s runs/r5/hlo_pixels.txt.gz ]; then
    commit_logged "r5 artifacts: committed compiled-HLO dumps for the roofline (closes VERDICT-r4 evidence hole)" \
        runs/r5/hlo_f32.txt.gz runs/r5/hlo_bf16.txt.gz runs/r5/hlo_pixels.txt.gz
    echo "HLO_DONE" >> $LOG
else
    echo "HLO_INCOMPLETE" >> $LOG
fi

# --- 2) bf16 FRAMES sweep at B=256 + anchor.
bench_run bf16_F16_anchor BENCH_BATCH=256 BENCH_FRAMES=16
bench_run bf16_F8 BENCH_BATCH=256 BENCH_FRAMES=8
bench_run bf16_F24 BENCH_BATCH=256 BENCH_FRAMES=24
bench_run bf16_F32_M25 BENCH_BATCH=256 BENCH_FRAMES=32 BENCH_M=25
commit_logged "r5 artifacts: bf16 FRAMES sweep at B=256 (raw)" \
    runs/r5/bench_results.txt runs/r5/queue_a.log runs/r5/bench_bf16_F*.log
echo "QUEUE_A_DONE" >> $LOG
git add -f runs/r5/queue_a.log >> $LOG 2>&1
git commit -q -m "r5a queue: final log" >> $LOG 2>&1
