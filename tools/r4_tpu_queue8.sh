#!/bin/bash
# Round-4 queue 8: slim state I/O + packed-path fused butterfly.
set -x
cd /root/repo

echo "=== q8 stage 1: hardware bit-match (slim state + packed butterfly) ==="
timeout 1800 python -u tools/scl_hw_bitmatch.py 2>&1 | grep -v WARNING | tail -3

echo "=== q8 stage 2: headline 4096x32 c128 ==="
timeout 1800 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== q8 stage 3: batch-shape re-check ==="
timeout 2400 python -u tools/scl_batch_shape_ab.py --shapes 8192x16,2048x64 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -3

echo "=== q8 done ==="
