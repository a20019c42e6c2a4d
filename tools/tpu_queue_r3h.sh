#!/bin/sh
# r3h queue: (1) reference-scale VSS step proof with per-block remat
# (the r3g run OOMed at 23.58G vs 15.75G HBM; remat drops the BN/ELU
# gradient stash — bit-equivalent by test); (2) the CALC2 aliasing
# round with the InfoNCE objective (runs/r3f showed the margin-0.5
# hinge is pinned/unsatisfiable in the aliasing regime: trained p50
# true-revisit 0.9866 vs aliased-impostor 0.9865, PR-AUC 0.716->0.637
# — InfoNCE's temperature rescales milli-cosine gaps into O(1) logit
# gaps). Same protocol as r3f (w32, 4000 steps, train-aliasing 4,
# sweep 2/4/8/16) so the comparison is apples-to-apples.
cd /root/repo
mkdir -p runs/r3h
LOG=runs/r3h/queue.log
: > $LOG

echo "=== vss fullscale step, remat=1 (width 32, 192x256, batch 12)" >> $LOG
timeout 1500 python -u tools/vss_fullscale_step.py >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "=== calc2 w32 infonce tau=0.01 train-aliasing=4 + sweep" >> $LOG
timeout 7200 python -u examples/calc2_bundled_run.py \
    --steps 4000 --width 32 --batch 8 --images 2048 \
    --sim-objective infonce --sim-tau 0.01 \
    --train-aliasing 4 --aliasing 4 --aliasing-sweep 2,4,8,16 \
    --places 64 --out runs/calc2_r3infonce >> $LOG 2>&1
echo "--- rc=$? at $(date +%H:%M:%S)" >> $LOG

echo "QUEUE_DONE" >> $LOG
