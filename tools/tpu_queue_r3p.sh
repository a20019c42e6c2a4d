#!/bin/sh
# r3p queue (fresh host, round-3 continuation): re-run the two jobs the
# recycle killed.
# 1) r3n science item — train WITH the appearance model as positive-view
#    augmentation (TrainConfig.aug_severity=1.5) on independent scenes,
#    then sweep eval severity trained-vs-untrained on held-out places.
#    Success = positive lift at severity >= 1.5 (the realistic-protocol
#    training-value demonstration; docs/CALC2_RUN.md r3 severity table
#    shows clean-trained DEGRADES under appearance change).
# 2) r3o batch re-sweep on both storage programs (the optimum moves
#    after update-cost changes; bench.py defaults B=256).
#
# Hardened after the 01:07 incident: a run that connects to the tunnel
# during a bad window hangs FOREVER at 0% CPU (main thread futex, one
# thread ep_poll) even though fresh connections work — timeout alone
# burns the whole budget. stall_watch kills the leg if its run dir stops
# growing for 12 min; the training leg gets one retry.
cd /root/repo
mkdir -p runs/r3p
LOG=runs/r3p/queue.log
: > $LOG

probe() {
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
    do echo "tunnel down at $(date +%H:%M:%S); sleeping 120" >> $LOG; sleep 120; done
}

# stall_watch DIR CMDPID: kill CMDPID if nothing under DIR (or the log)
# gets a newer mtime for 720 s.
stall_watch() {
    dir=$1; pid=$2
    while kill -0 "$pid" 2>/dev/null; do
        sleep 180
        new=$(find "$dir" "$LOG" -newermt '-720 seconds' 2>/dev/null | head -1)
        if [ -z "$new" ]; then
            echo "WATCHDOG: no progress in 12 min, killing $pid at $(date +%H:%M:%S)" >> $LOG
            kill "$pid" 2>/dev/null
            sleep 5
            kill -9 "$pid" 2>/dev/null
            return
        fi
    done
}

train_leg() {
    echo "=== calc2 w32 train-severity=1.5 independent scenes  $(date +%H:%M:%S)" >> $LOG
    timeout 5400 python -u examples/calc2_bundled_run.py \
        --steps 4000 --width 32 --batch 8 --images 2048 \
        --train-severity 1.5 --eval-severity 1.5 \
        --places 64 --out runs/calc2_r3sev >> $LOG 2>&1 &
    CPID=$!
    stall_watch runs/calc2_r3sev $CPID &
    WPID=$!
    wait $CPID
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
    kill $WPID 2>/dev/null
}

probe
train_leg
if [ ! -f runs/calc2_r3sev/calc2_metrics.json ]; then
    echo "=== training leg produced no metrics; retrying once" >> $LOG
    rm -rf runs/calc2_r3sev
    probe
    train_leg
fi

echo "=== severity sweep of the severity-trained checkpoint (CPU)" >> $LOG
timeout 3600 python -u tools/eval_severity_sweep.py \
    --run runs/calc2_r3sev --width 32 --hw 96 128 --places 64 \
    --severities 0,1,1.5,2,2.5 --cpu \
    --out runs/r3p/severity_sweep_sevtrained.json >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
echo "TRAIN_DONE" >> $LOG

run() {
    echo "=== $1  $(date +%H:%M:%S)" >> $LOG
    shift
    probe
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "f32 B=192"  BENCH_PSTORE=f32 BENCH_BATCH=192
run "f32 B=384"  BENCH_PSTORE=f32 BENCH_BATCH=384
run "bf16 B=192" BENCH_BATCH=192
run "bf16 B=384" BENCH_BATCH=384
run "f32 B=128"  BENCH_PSTORE=f32 BENCH_BATCH=128

echo "QUEUE_DONE" >> $LOG
