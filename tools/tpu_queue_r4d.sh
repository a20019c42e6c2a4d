#!/bin/sh
# r4d queue — A/B the chained single-axis window-extraction form
# (EKF_MATCHWIN=chain) against the shipped shared form. The r4c
# attribution pinned the per-slot 2-axis dynamic slice at 53% of the
# unstaggered pixels step (2,313.7 -> 4,954.7 with the offsets pinned);
# chain replaces it with two 1-D-gather-lowering slices (the round-2
# layout lesson). Legs: unstaggered A/B anchor, then the staggered
# shipped default if the unstaggered leg wins.
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue_d.log
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

bench_run pixels_chain_unstag BENCH_MODE=pixels BENCH_STAGGER=0 \
    EKF_MATCHWIN=chain

base=$(awk '/^pixels_unstag /{v=$2} END{print v}' runs/r4/bench_results.txt)
chain=$(awk '/^pixels_chain_unstag /{v=$2} END{print v}' runs/r4/bench_results.txt)
echo "unstag A/B: shared=$base chain=$chain" >> $LOG
win=$(awk -v a="$chain" -v b="$base" 'BEGIN{print (a > b) ? 1 : 0}')
if [ "$win" = "1" ]; then
    bench_run pixels_chain_stag4 BENCH_MODE=pixels EKF_MATCHWIN=chain
else
    echo "chain LOSES unstaggered; skipping the staggered leg" >> $LOG
fi

echo "QUEUE_D_DONE" >> $LOG
