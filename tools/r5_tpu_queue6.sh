#!/bin/bash
# Round-5 queue 6: live-width v2 — NARROW Pallas superkernels (the v1
# narrow->XLA fallback measured flat: XLA steps have a ~0.9 ms/chunk
# floor regardless of width, r5q4 stage 2).
#  1. flagship headline with narrow kernels
#  2. floor split (all_frozen now runs width-1 kernels END TO END)
#  3. hardware bit-match of the narrow-kernel path
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

echo "=== r5q6 stage 1: flagship headline, live-width v2 ==="
$SG 1800 900 -- python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== r5q6 stage 2: floor split, live-width v2 ==="
$SG 3600 900 -- python -u tools/scl_breakdown_probe.py \
    --N 1024 --L 8 --batch 4096 --chunk 128 --control unroll-kernel \
    --perm rank --leaf onehot \
    --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING

echo "=== r5q6 stage 3: hardware bit-match, narrow kernels ==="
$SG 3600 900 -- python -u tools/scl_hw_bitmatch.py \
    2>&1 | grep -v WARNING | tail -4

echo "=== r5q6 done ==="
