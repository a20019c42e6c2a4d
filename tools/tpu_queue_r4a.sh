#!/bin/sh
# r4a queue — round-4 TPU work, in VERDICT-r3 priority order:
#   1) the twice-failed severity-augmented training experiment (r3n/r3p)
#      + the gated severity sweep (VERDICT #1),
#   2) fine-grain f32 batch sweep B in {96,112,128,144,160} + best-of-3
#      repeats at the argmax (VERDICT #2),
#   3) compiled-HLO dumps of the three headline programs for the
#      roofline analysis (VERDICT #4),
#   4) one pixels-mode confirm run (VERDICT #6).
#
# Hardened per ADVICE r3:
#   - legs are killed as a PROCESS GROUP (GNU timeout already setpgids
#     its child; /bin/kill -- -PID takes the python down with it), so a
#     stuck 0%-CPU tunnel process can never be orphaned to double-book
#     the chip (ADVICE #1);
#   - the stall window is 1500 s (25 min), above the worst-case 15-20
#     min tunnel compile that got both r3p training attempts killed
#     mid-compile (ADVICE #2) — and train.fit now prints a compile-start
#     marker + a heartbeat line every 50 steps so the log mtime advances
#     through a healthy run;
#   - the severity sweep and the TRAIN_DONE marker are gated on the
#     checkpoint actually existing; a failed leg emits TRAIN_FAILED so
#     the harvester commit message reflects reality (ADVICE #3);
#   - the tunnel is re-probed before every leg INCLUDING the retry.
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue.log
: > $LOG

probe() {
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
    do echo "tunnel down at $(date +%H:%M:%S); sleeping 120" >> $LOG; sleep 120; done
}

# stall_watch DIR PID: group-kill PID if nothing under DIR (or the log)
# gains a newer mtime for 1500 s.
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

train_leg() {
    echo "=== calc2 w32 train-severity=1.5 independent scenes  $(date +%H:%M:%S)" >> $LOG
    timeout -k 30 5400 python -u examples/calc2_bundled_run.py \
        --steps 4000 --width 32 --batch 8 --images 2048 \
        --train-severity 1.5 --eval-severity 1.5 \
        --places 64 --out runs/calc2_r4sev >> $LOG 2>&1 &
    CPID=$!
    stall_watch runs/calc2_r4sev $CPID &
    WPID=$!
    wait $CPID
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
    kill $WPID 2>/dev/null
}

probe
train_leg
if [ ! -d runs/calc2_r4sev/ckpt_final ]; then
    echo "=== training leg produced no final checkpoint; retrying once" >> $LOG
    rm -rf runs/calc2_r4sev
    probe
    train_leg
fi

if [ -d runs/calc2_r4sev/ckpt_final ]; then
    echo "TRAIN_DONE" >> $LOG
    echo "=== severity sweep of the severity-trained checkpoint (CPU)" >> $LOG
    timeout -k 30 3600 python -u tools/eval_severity_sweep.py \
        --run runs/calc2_r4sev --width 32 --hw 96 128 --places 64 \
        --severities 0,1,1.5,2,2.5 --cpu \
        --out runs/r4/severity_sweep_sevtrained.json >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
else
    echo "TRAIN_FAILED" >> $LOG
fi
echo "SWEEP_DONE" >> $LOG

# --- fine-grain f32 batch sweep (r3p coarse sweep: B=128 10,827.7 beat
# the shipped B=256 default ~10,246 by 6%; "the optimum MOVES after any
# update-cost change", docs/BACKLOG.md #4).
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

for B in 96 112 128 144 160; do
    bench_run "f32_B$B" BENCH_PSTORE=f32 BENCH_BATCH=$B
done
BEST=$(sort -k2 -g runs/r4/bench_results.txt | awk '/^f32_B[0-9]* /{b=$1} END{sub("f32_B","",b); print b}')
[ -n "$BEST" ] || BEST=128
echo "=== f32 argmax B=$BEST; best-of-3 repeats" >> $LOG
bench_run "f32_B${BEST}rep2" BENCH_PSTORE=f32 BENCH_BATCH=$BEST
bench_run "f32_B${BEST}rep3" BENCH_PSTORE=f32 BENCH_BATCH=$BEST
echo "BATCH_SWEEP_DONE" >> $LOG

# --- compiled-HLO dumps for the roofline (analyze offline; DO NOT
# commit the dumps — they are tens of MB).
hlo_dump() {
    name=$1; shift
    echo "=== hlo dump $name  $(date +%H:%M:%S)" >> $LOG
    probe
    env "$@" timeout -k 30 1800 python -u tools/dump_hlo.py \
        runs/r4/hlo_$name.txt >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}
hlo_dump f32 BENCH_PSTORE=f32 BENCH_BATCH=$BEST BENCH_FRAMES=16 \
    EKF_DEFER=1 EKF_MGROWS=rowsel EKF_SDIAG=dotsel
hlo_dump bf16 BENCH_PSTORE=bf16 BENCH_BATCH=256 BENCH_FRAMES=16
hlo_dump pixels BENCH_MODE=pixels BENCH_MATCHER=descriptor BENCH_PIXB=32 \
    BENCH_FRAMES=16
echo "HLO_DONE" >> $LOG

# --- pixels confirm run at current defaults (closure-note anchor).
bench_run pixels_default BENCH_MODE=pixels

echo "QUEUE_DONE" >> $LOG
