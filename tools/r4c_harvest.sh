#!/bin/sh
# Detached harvester for the r4c queue (bounded wait per ADVICE r3 #4;
# partial commit on timeout — only committed state survives a recycle).
cd /root/repo
L=runs/r4/queue_c.log

i=0
while ! grep -q "QUEUE_C_DONE" "$L" 2>/dev/null; do
    sleep 60
    i=$((i + 1))
    [ "$i" -ge 150 ] && break
done

git add -f runs/r4/queue_c.log runs/r4/bench_results.txt \
    runs/r4/bench_pixels_unstag.log runs/r4/bench_pixels_sharedext.log \
    runs/r4/bench_pixels_describe.log runs/r4/bench_pixels_fast.log \
    2>/dev/null
if grep -q "QUEUE_C_DONE" "$L" 2>/dev/null; then
    msg="r4 artifacts: pixels matcher attribution cells (raw)"
else
    msg="r4 artifacts: pixels matcher attribution PARTIAL (harvest timeout)"
fi
git diff --cached --quiet || git commit -q -m "$msg"
