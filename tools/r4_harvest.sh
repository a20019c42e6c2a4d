#!/bin/sh
# Detached harvester for the r4a queue: only committed state survives a
# host recycle (runs/ is gitignored). Per ADVICE r3 #4, every wait is
# BOUNDED; on timeout it falls through to a best-effort partial commit of
# whatever artifacts exist. Checkpoints and HLO dumps stay uncommitted
# (large).
cd /root/repo
L=runs/r4/queue.log

# waitfor REGEX MAX_MINUTES -> 0 if the marker appeared, 1 on timeout.
waitfor() {
    i=0
    while ! grep -Eq "$1" "$L" 2>/dev/null; do
        sleep 60
        i=$((i + 1))
        [ "$i" -ge "$2" ] && return 1
    done
    return 0
}

commit_train() {
    git add -f runs/r4/queue.log runs/r4/severity_sweep_sevtrained.json \
        runs/calc2_r4sev/calc2_metrics.json \
        runs/calc2_r4sev/train_metrics.jsonl 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

if waitfor "SWEEP_DONE" 240; then
    if grep -q TRAIN_FAILED "$L"; then
        commit_train "r4 artifacts: severity training leg FAILED (raw log)"
    else
        commit_train "r4 artifacts: severity-trained w32 run + severity sweep (raw)"
    fi
else
    commit_train "r4 artifacts: severity training leg PARTIAL (harvest timeout)"
fi

waitfor "BATCH_SWEEP_DONE" 90
git add -f runs/r4/queue.log runs/r4/bench_results.txt \
    runs/r4/bench_*.log 2>/dev/null
git diff --cached --quiet || \
    git commit -q -m "r4 artifacts: f32 fine batch sweep (raw)"

waitfor "QUEUE_DONE" 150
git add -f runs/r4/queue.log runs/r4/bench_results.txt \
    runs/r4/bench_*.log 2>/dev/null
git diff --cached --quiet || \
    git commit -q -m "r4 artifacts: queue tail (HLO dump log + pixels confirm)"
