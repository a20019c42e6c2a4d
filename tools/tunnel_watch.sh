#!/bin/sh
# Probe the axon tunnel every 5 min; when healthy, run the given queue
# script once. Usage: nohup sh tools/tunnel_watch.sh tools/tpu_queue_r2o.sh &
# (CLAUDE.md "tunnel can go DOWN" playbook — jax.devices() hangs at 0% CPU
# while the tunnel is out; CPU-forced work is unaffected.)
QUEUE=${1:-tools/tpu_queue_r2o.sh}
cd /root/repo
mkdir -p runs/r2o
for i in $(seq 1 60); do
    if timeout 180 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
        echo "tunnel healthy at $(date)" >> runs/r2o/watch.log
        sh "$QUEUE"
        exit 0
    fi
    echo "probe $i: tunnel down at $(date)" >> runs/r2o/watch.log
    sleep 300
done
echo "gave up after 60 probes" >> runs/r2o/watch.log
