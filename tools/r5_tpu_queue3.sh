#!/bin/bash
# Round-5 queue 3: serving + layered-promotion artifacts.
#  1. adaptive serving sweep re-measure (post cond-guard fix) — target
#     >= 1150 Mbps at 0% fallback (VERDICT r4 item 6)
#  2. n=8192 paired flooding-vs-layered NMS waterfall parity + the
#     million-frame serving MC through schedule=layered (item 3)
set -x
cd /root/repo

echo "=== r5q3 stage 1: adaptive serving sweep (post-fix) ==="
timeout 4500 python -u tools/serving_runs.py \
    2>&1 | grep -v WARNING | tail -20

echo "=== r5q3 stage 2: n=8192 layered parity + million-frame MC ==="
timeout 5400 python -u tools/large_code_mc.py --skip-polar \
    --frames 1000000 --ldpc-snr -1.25 --ldpc-decoder nms \
    --ldpc-schedule layered --ldpc-parity-frames 200000 \
    2>&1 | grep -v WARNING | tail -12

echo "=== r5q3 done ==="
