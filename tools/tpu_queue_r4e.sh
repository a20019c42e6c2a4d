#!/bin/sh
# r4e queue — fine-grain bf16 batch sweep. The f32 fine sweep (r4a)
# found a padded-tile resonance knee at B=128 (+5.8%) that the coarse
# {192,256,384} grid could not see (112/144 sit BELOW 96); bf16 has
# only ever been coarse-swept, so the same resonance may be hiding.
# Legs include a same-chip/day B=256 anchor; best-of-3 repeats at the
# argmax if it beats the anchor.
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue_e.log
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

for B in 256 128 160 224 240 272 288 320; do
    bench_run "bf16_B$B" BENCH_PSTORE=bf16 BENCH_BATCH=$B
done

BESTLINE=$(grep '^bf16_B' runs/r4/bench_results.txt | sort -k2 -g | tail -1)
BEST=$(echo "$BESTLINE" | sed 's/^bf16_B//; s/ .*//')
echo "bf16 argmax: $BESTLINE" >> $LOG
if [ -n "$BEST" ] && [ "$BEST" != "256" ]; then
    bench_run "bf16_B${BEST}rep2" BENCH_PSTORE=bf16 BENCH_BATCH=$BEST
    bench_run "bf16_B${BEST}rep3" BENCH_PSTORE=bf16 BENCH_BATCH=$BEST
fi

echo "QUEUE_E_DONE" >> $LOG
