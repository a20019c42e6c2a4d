#!/bin/sh
# r3b queue: (1) dump the f32 parity-config compiled HLO for the
# padded-bytes + estimated-cycles attribution (the round-2-proven
# methodology, docs/BENCH.md) at the EXACT bench operating point;
# (2) the bf16/f32/f64 drift legs (VERDICT r3 task 2) — re-run after
# the r3a ModuleNotFoundError (sys.path fix landed after that queue ran).
cd /root/repo
mkdir -p runs/r3b
LOG=runs/r3b/queue.log
: > $LOG

echo "=== dump f32 HLO (B=256 F=16 M=24 NHYP=64)" >> $LOG
env BENCH_PSTORE=f32 BENCH_BATCH=256 BENCH_FRAMES=16 \
    timeout 1500 python -u tools/dump_hlo.py runs/r3b/f32_step.hlo >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "=== drift leg bf16 (fast mode)" >> $LOG
timeout 1500 python -u tools/measure_pstore_drift.py bf16 >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
echo "=== drift leg f32 (parity mode)" >> $LOG
timeout 1500 python -u tools/measure_pstore_drift.py f32 >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
echo "=== drift leg f64 (CPU oracle-dtype)" >> $LOG
timeout 3000 python -u tools/measure_pstore_drift.py f64 >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG
echo "=== drift compare" >> $LOG
python -u tools/measure_pstore_drift.py compare >> $LOG 2>&1

echo "QUEUE_DONE" >> $LOG
