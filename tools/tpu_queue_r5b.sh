#!/bin/sh
# r5b queue — VERDICT-r4 #2: the full system with its own trained
# perception. Steps:
#   1) retrain the w32 severity-0 control (the r4ctl checkpoints were
#      never committed and died with the host): identical protocol to
#      tpu_queue_r4b.sh:63-75.
#   2) loop-closure e2e (pan + outback) with the TRAINED checkpoint at
#      the r4 experiment's frame/seed protocol, CPU-only (the embed is
#      the only model call; the experiment is deterministic per seed).
#   3) one STRESSED variant: --lc-severity 1.0 cross-season corruption
#      of the retrieval input on every frame (independent fields, so DB
#      view and revisit view differ — the regime where untrained holds
#      ~0.97 per the r4 calibration), trained vs untrained.
# The e2e legs are CPU; they run here (after the TPU training leg) so
# nothing times against them on the chip.
cd /root/repo
mkdir -p runs/r5
LOG=runs/r5/queue_b.log
: > $LOG

probe() {
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
    do echo "tunnel down at $(date +%H:%M:%S); sleeping 120" >> $LOG; sleep 120; done
}

commit_logged() {
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

# --- 1) w32 control training (TPU), checkpoint kept.
train_leg() {
    echo "=== calc2 w32 CONTROL retrain (sev 0)  $(date +%H:%M:%S)" >> $LOG
    timeout -k 30 5400 python -u examples/calc2_bundled_run.py \
        --steps 4000 --width 32 --batch 8 --images 2048 \
        --train-severity 0 --eval-severity 1.5 \
        --places 64 --out runs/calc2_r5ctl >> $LOG 2>&1 &
    CPID=$!
    stall_watch runs/calc2_r5ctl $CPID &
    WPID=$!
    wait $CPID
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
    kill $WPID 2>/dev/null
}

probe
train_leg
if [ ! -d runs/calc2_r5ctl/ckpt_final ]; then
    echo "=== training produced no final checkpoint; retrying once" >> $LOG
    rm -rf runs/calc2_r5ctl
    probe
    train_leg
fi
if [ -d runs/calc2_r5ctl/ckpt_final ]; then
    echo "TRAIN_DONE" >> $LOG
    commit_logged "r5 artifacts: w32 control training metrics (ckpt on disk, not committed)" \
        runs/calc2_r5ctl/calc2_metrics.json runs/calc2_r5ctl/train_metrics.jsonl
else
    echo "TRAIN_FAILED" >> $LOG
    echo "QUEUE_B_DONE" >> $LOG
    exit 0
fi

# --- 2+3) e2e legs (CPU). Protocol = docs/CALC2_RUN.md r4 (150 frames,
# 4 seeds, pixels front-end) with the trained w32 embed at its training
# resolution 96x128.
e2e() {
    name=$1; shift
    echo "=== loop e2e $name  $(date +%H:%M:%S)" >> $LOG
    timeout -k 30 7200 python -u examples/run_loop_closure.py \
        --frontend pixels --frames 150 --ensemble 4 --cpu \
        --json runs/r5/loop_e2e_$name.json "$@" >> $LOG 2>&1 &
    EPID=$!
    stall_watch runs/r5 $EPID &
    WPID=$!
    wait $EPID
    echo "--- $name rc=$? at $(date +%H:%M:%S)" >> $LOG
    kill $WPID 2>/dev/null
}

# Untrained controls use the SAME w32/96x128 architecture (no ckpt) so
# the comparison isolates training, not capacity/resolution.
CKPT=runs/calc2_r5ctl/ckpt_final
e2e trained_pan --traj pan --ckpt $CKPT --vss-width 32 --vss-hw 96 128
e2e trained_outback --traj outback --ckpt $CKPT --vss-width 32 --vss-hw 96 128
e2e trained_pan_sev1 --traj pan --ckpt $CKPT --vss-width 32 --vss-hw 96 128 \
    --lc-severity 1.0
e2e untrained_pan_sev1 --traj pan --vss-width 32 --vss-hw 96 128 \
    --lc-severity 1.0
e2e untrained_pan --traj pan --vss-width 32 --vss-hw 96 128

for f in runs/r5/loop_e2e_trained_pan.json \
         runs/r5/loop_e2e_trained_outback.json \
         runs/r5/loop_e2e_trained_pan_sev1.json \
         runs/r5/loop_e2e_untrained_pan_sev1.json \
         runs/r5/loop_e2e_untrained_pan.json; do
    [ -s "$f" ] && git add -f "$f" >> $LOG 2>&1
done
commit_logged "r5 artifacts: trained-perception loop e2e (pan/outback/stressed)" \
    runs/r5/queue_b.log
echo "QUEUE_B_DONE" >> $LOG
git add -f runs/r5/queue_b.log >> $LOG 2>&1
git commit -q -m "r5b queue: final log" >> $LOG 2>&1
