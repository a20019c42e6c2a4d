#!/bin/sh
# r4b queue — second round-4 TPU batch:
#   1) confirm run of the NEW shipped f32 default (BENCH_PSTORE=f32 now
#      defaults BENCH_BATCH=128 after the r4a fine sweep) — the VERDICT
#      #2 "done" criterion (default run >= 10.8k);
#   2) the severity-0 CONTROL training leg: identical protocol to the
#      r4a severity-trained run (w32, 4000 steps, 2048 images, b8,
#      places 64) but --train-severity 0 — isolates whether the negative
#      severity lift (runs/r4/severity_sweep_sevtrained.json +
#      diagnose_sevtrained.json) is caused by the severity augmentation
#      or by ANY training at this scale losing on the 64-way top-1
#      retrieval protocol;
#   3) the gated severity sweep of the control checkpoint.
#
# Hardening identical to r4a (ADVICE r3): process-group kills, 25-min
# mtime stall watchdog (above worst-case tunnel compile), tunnel probe
# before every leg including the retry, sweep + markers gated on the
# checkpoint existing.
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue_b.log
: > $LOG

probe() {
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
    do echo "tunnel down at $(date +%H:%M:%S); sleeping 120" >> $LOG; sleep 120; done
}

stall_watch() {
    dir=$1; pid=$2
    while kill -0 "$pid" 2>/dev/null; do
        sleep 180
        new=$(find "$dir" "$LOG" -newermt '-1500 seconds' 2>/dev/null | head -1)
        if [ -z "$new" ]; then
            echo "WATCHDOG: no progress in 25 min, group-killing $pid at $(date +%H:%M:%S)" >> $LOG
            /bin/kill -TERM -- -"$pid" 2>/dev/null
            sleep 15
            /bin/kill -KILL -- -"$pid" 2>/dev/null
            return
        fi
    done
}

bench_run() {
    name=$1; shift
    out=runs/r4/bench_$name.log
    echo "=== bench $name  $(date +%H:%M:%S)" >> $LOG
    probe
    env "$@" timeout -k 30 1500 python -u bench.py > "$out" 2>&1
    rc=$?
    grep '"metric"' "$out" >> $LOG
    echo "--- $name rc=$rc at $(date +%H:%M:%S)" >> $LOG
    val=$(grep -o '"value": [0-9.]*' "$out" | tail -1 | awk '{print $2}')
    [ -n "$val" ] && echo "$name $val" >> runs/r4/bench_results.txt
}

# --- 1) shipped-default confirm (env sets ONLY the storage mode; batch
# and the f32 form defaults come from bench.py itself).
bench_run f32_default BENCH_PSTORE=f32
echo "F32_DEFAULT_DONE" >> $LOG

# --- 2) severity-0 control training leg.
train_leg() {
    echo "=== calc2 w32 CONTROL train-severity=0  $(date +%H:%M:%S)" >> $LOG
    timeout -k 30 5400 python -u examples/calc2_bundled_run.py \
        --steps 4000 --width 32 --batch 8 --images 2048 \
        --train-severity 0 --eval-severity 1.5 \
        --places 64 --out runs/calc2_r4ctl >> $LOG 2>&1 &
    CPID=$!
    stall_watch runs/calc2_r4ctl $CPID &
    WPID=$!
    wait $CPID
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
    kill $WPID 2>/dev/null
}

probe
train_leg
if [ ! -d runs/calc2_r4ctl/ckpt_final ]; then
    echo "=== control training produced no final checkpoint; retrying once" >> $LOG
    rm -rf runs/calc2_r4ctl
    probe
    train_leg
fi

if [ -d runs/calc2_r4ctl/ckpt_final ]; then
    echo "CTL_TRAIN_DONE" >> $LOG
    echo "=== severity sweep of the CONTROL checkpoint (CPU)" >> $LOG
    timeout -k 30 3600 python -u tools/eval_severity_sweep.py \
        --run runs/calc2_r4ctl --width 32 --hw 96 128 --places 64 \
        --severities 0,1,1.5,2,2.5 --cpu \
        --out runs/r4/severity_sweep_ctltrained.json >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
else
    echo "CTL_TRAIN_FAILED" >> $LOG
fi
echo "CTL_SWEEP_DONE" >> $LOG
echo "QUEUE_B_DONE" >> $LOG
