#!/bin/sh
# r3p queue (fresh host, round-3 continuation): re-run the two jobs the
# recycle killed.
# 1) r3n science item — train WITH the appearance model as positive-view
#    augmentation (TrainConfig.aug_severity=1.5) on independent scenes,
#    then sweep eval severity trained-vs-untrained on held-out places.
#    Success = positive lift at severity >= 1.5 (the realistic-protocol
#    training-value demonstration; docs/CALC2_RUN.md r3 severity table
#    shows clean-trained DEGRADES 0.95->0.55 at severity 2).
# 2) r3o batch re-sweep on both storage programs (the optimum moves
#    after update-cost changes; bench.py defaults B=256).
cd /root/repo
mkdir -p runs/r3p
LOG=runs/r3p/queue.log
: > $LOG

echo "=== calc2 w32 train-severity=1.5 independent scenes  $(date +%H:%M:%S)" >> $LOG
timeout 5400 python -u examples/calc2_bundled_run.py \
    --steps 4000 --width 32 --batch 8 --images 2048 \
    --train-severity 1.5 --eval-severity 1.5 \
    --places 64 --out runs/calc2_r3sev >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

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
    env "$@" timeout 1500 python -u bench.py >> $LOG 2>&1
    echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
}

run "f32 B=192"  BENCH_PSTORE=f32 BENCH_BATCH=192
run "f32 B=384"  BENCH_PSTORE=f32 BENCH_BATCH=384
run "bf16 B=192" BENCH_BATCH=192
run "bf16 B=384" BENCH_BATCH=384
run "f32 B=128"  BENCH_PSTORE=f32 BENCH_BATCH=128

echo "QUEUE_DONE" >> $LOG
