#!/bin/bash
# Round-5 session B: small-P tile sweep at the cull-0.125 shapes
# (S=8 coarse / S=24 fine), all three kernel flavors, slope-timed.
# Output: artifacts/kernel_tiles_r5.json (+ full log in /tmp).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5400 python tools/kernel_bench.py --rays 2048 --reps 8 \
    --shapes 8 24 --max_ts 256 512 1024 2048 4096 \
    2>&1 | tee /tmp/kernel_tiles_r5.log
tail -1 /tmp/kernel_tiles_r5.log > artifacts/kernel_tiles_r5.json
