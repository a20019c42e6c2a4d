#!/bin/sh
# Detached harvester for the r4e (bf16 fine batch sweep) + chained r4f
# (f32 form A/B at B=128) queues: only committed state survives a host
# recycle (runs/ is gitignored). Waits are BOUNDED (ADVICE r3 #4); on
# timeout it falls through to a best-effort partial commit.
cd /root/repo

waitfor() {  # waitfor FILE REGEX MAX_MINUTES
    i=0
    while ! grep -Eq "$2" "$1" 2>/dev/null; do
        sleep 60
        i=$((i + 1))
        [ "$i" -ge "$3" ] && return 1
    done
    return 0
}

harvest() {
    git add -f runs/r4/queue_e.log runs/r4/queue_f.log \
        runs/r4/bench_results.txt runs/r4/bench_bf16_*.log \
        runs/r4/bench_f32_B128_*.log 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

if waitfor runs/r4/queue_e.log "QUEUE_E_DONE" 120; then
    harvest "r4 artifacts: bf16 fine batch sweep (raw)"
else
    harvest "r4 artifacts: bf16 batch sweep PARTIAL (harvest timeout)"
fi

if waitfor runs/r4/queue_f.log "QUEUE_F_DONE" 60; then
    harvest "r4 artifacts: f32 form A/B at B=128 (raw)"
else
    harvest "r4 artifacts: f32 form A/B PARTIAL (harvest timeout)"
fi
