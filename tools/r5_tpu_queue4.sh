#!/bin/bash
# Round-5 queue 4: live-width (incremental-list) decoding on hardware.
#  1. flagship headline A/B (live_width auto ON via default)
#  2. floor split with live width — how much did the early-chunk waste cut?
#  3. hardware bit-match: live unroll-kernel vs legacy split/onehot,
#     plus the MXU matmul-apply gate config (ADVICE r4 #1)
#  4. N=4096 SCL-32 with live width through the unroll-fused control,
#     chained-scan methodology (stallguarded: giant-XLA wedge risk)
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

echo "=== r5q4 stage 1: flagship headline, live-width ==="
$SG 1800 900 -- python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== r5q4 stage 2: floor split, live-width ==="
$SG 3600 900 -- python -u tools/scl_breakdown_probe.py \
    --N 1024 --L 8 --batch 4096 --chunk 128 --control unroll-kernel \
    --perm rank --leaf onehot \
    --masks all_frozen,real_rate_half,all_info 2>&1 | grep -v WARNING

echo "=== r5q4 stage 3: hardware bit-match (live + matmul gate) ==="
$SG 3600 900 -- python -u tools/scl_hw_bitmatch.py --matmul-min-l 8 \
    2>&1 | grep -v WARNING | tail -6

echo "=== r5q4 stage 4: N=4096 live-width unroll-fused, chained ==="
$SG 4500 1200 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --scan-chunks 8 \
    --out-name polar_n4096_scl32_live.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q4 done ==="
