#!/bin/bash
# Round-4 queue 6: chunk-size sweep under the packed algebra.
# The variant probe showed per-chunk-step cost is now fixed-cost-bound
# (state DMA + launch), not op-bound: bigger chunks / mega should win.
set -x
cd /root/repo

echo "=== q6 stage 1: c128 re-measure (adds roll-partner levelpar) ==="
timeout 1800 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== q6 stage 2: c256 ==="
timeout 2400 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 256 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== q6 stage 3: c512 ==="
timeout 2400 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 512 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== q6 stage 4: mega (whole-decode kernel) ==="
timeout 3000 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control mega 2>&1 | grep -v WARNING | tail -2

echo "=== q6 done ==="
