#!/bin/sh
# r4f queue — re-validate the f32 form composition at the NEW B=128 knee.
# The defer/rowsel/dotsel defaults were measured at B=256 (r3c/r3e); the
# backlog rule ("the optimum MOVES after any update-cost change") cuts
# both ways — the batch move changes every padded shape, so each form's
# sign must be re-confirmed at B=128. Explicit env overrides beat the
# bench.py f32 setdefaults, so each leg toggles ONE form back to the
# baseline lowering while the other two stay at the shipped f32 optimum.
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue_f.log
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

# Same-chip/day anchor at the shipped composition (B=128 default).
bench_run "f32_B128_anchor" BENCH_PSTORE=f32
bench_run "f32_B128_nodefer" BENCH_PSTORE=f32 EKF_DEFER=0
bench_run "f32_B128_mgslotdot" BENCH_PSTORE=f32 EKF_MGROWS=slotdot
bench_run "f32_B128_sdflat" BENCH_PSTORE=f32 EKF_SDIAG=flatgather

echo "QUEUE_F_DONE" >> $LOG
