#!/bin/sh
# Detached harvester for the r4b queue (bounded waits per ADVICE r3 #4;
# partial commits on timeout — only committed state survives a recycle).
cd /root/repo
L=runs/r4/queue_b.log

waitfor() {
    i=0
    while ! grep -Eq "$1" "$L" 2>/dev/null; do
        sleep 60
        i=$((i + 1))
        [ "$i" -ge "$2" ] && return 1
    done
    return 0
}

waitfor "F32_DEFAULT_DONE" 45
git add -f runs/r4/queue_b.log runs/r4/bench_results.txt \
    runs/r4/bench_f32_default.log 2>/dev/null
git diff --cached --quiet || \
    git commit -q -m "r4 artifacts: f32 shipped-default confirm run (raw)"

commit_ctl() {
    git add -f runs/r4/queue_b.log runs/r4/severity_sweep_ctltrained.json \
        runs/calc2_r4ctl/calc2_metrics.json \
        runs/calc2_r4ctl/train_metrics.jsonl 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

if waitfor "CTL_SWEEP_DONE" 240; then
    if grep -q CTL_TRAIN_FAILED "$L"; then
        commit_ctl "r4 artifacts: severity-0 CONTROL training FAILED (raw log)"
    else
        commit_ctl "r4 artifacts: severity-0 CONTROL run + severity sweep (raw)"
    fi
else
    commit_ctl "r4 artifacts: severity-0 CONTROL partial (harvest timeout)"
fi
