#!/bin/sh
# r4c queue — pixels-path matcher attribution at the CURRENT operating
# point (VERDICT-r3 #6): the descriptor split's one unmeasured cell
# (shared extraction) plus re-measured describe/FAST cells, all against
# an unstaggered baseline compiled from the same code.
#
# Why unstaggered: EKF_ABLATE legs are not phase-splittable, so bench.py
# falls back to the plain vmap driver for them (bench.py main_pixels) —
# the deltas are only meaningful against a BENCH_STAGGER=0 baseline.
# Why these three knobs: in the shared-extraction form the LEAF knobs
# are sharedext / describe / fast; topk+winext force the split form
# (frontend.match_all_descriptor) and dmatch/match cut the DAG at the
# root, which XLA DCEs into a non-attribution (docs/BENCH.md r2o
# caveat).
#
# Hardened per ADVICE r3 (same pattern as tpu_queue_r4a.sh): probe
# before every leg, process-group kills, per-leg timeout.
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue_c.log
: > $LOG

probe() {
    until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
    do echo "tunnel down at $(date +%H:%M:%S); sleeping 120" >> $LOG; sleep 120; done
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

bench_run pixels_unstag      BENCH_MODE=pixels BENCH_STAGGER=0
bench_run pixels_sharedext   BENCH_MODE=pixels EKF_ABLATE=sharedext
bench_run pixels_describe    BENCH_MODE=pixels EKF_ABLATE=describe
bench_run pixels_fast        BENCH_MODE=pixels EKF_ABLATE=fast

echo "QUEUE_C_DONE" >> $LOG
