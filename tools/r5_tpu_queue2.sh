#!/bin/bash
# Round-5 queue 2: flagship floor attribution on the FINAL r4 tree +
# fast-mode fix-or-retire evidence + the matmul hardware exactness gate.
#  1. flagship floor split (all_frozen / real / all_info) — the r4
#     breakdown predates the last two r4 commits
#  2. per-chunk variant probe (kernel): fresh per-chunk cost attribution
#  3. TPU hardware gate for the MXU one-hot-matmul rank apply
#  4. fast-mode chunk sweep at the headline shape: does any chunk size
#     restore its edge over exact (448.6)?
#  5. exact c256 re-check on the final tree
set -x
cd /root/repo

echo "=== r5q2 stage 1: flagship floor split (final tree) ==="
timeout 3600 python -u tools/scl_breakdown_probe.py \
    --N 1024 --L 8 --batch 4096 --chunk 128 --control unroll-kernel \
    --perm rank --leaf onehot \
    --masks all_frozen,real_rate_half,all_info 2>&1 | grep -v WARNING

echo "=== r5q2 stage 2: per-chunk variant probe ==="
timeout 3600 python -u tools/scl_variant_probe.py --batch 4096 \
    --mode kernel 2>&1 | grep -v WARNING

echo "=== r5q2 stage 3: matmul apply hardware bit-match gate ==="
timeout 1800 python -u tools/scl_hw_bitmatch.py --no-kernel \
    --matmul-min-l 8 2>&1 | grep -v WARNING

echo "=== r5q2 stage 4: fast-mode chunk sweep 4096x32 ==="
for C in 128 256; do
  timeout 1800 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
      --chunk $C --control unroll-kernel --node-mode fast \
      2>&1 | grep -v WARNING | tail -2
done

echo "=== r5q2 stage 5: exact c256 re-check ==="
timeout 1800 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 256 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== r5q2 stage 6: batch scaling (throughput- vs latency-bound?) ==="
# fixed 131072 frames, varying per-decode batch: linear scaling => the
# kernels are throughput-bound; sublinear at small batch => fixed
# per-chunk/per-tile latency dominates (the floor's signature)
timeout 2400 python -u tools/scl_batch_shape_ab.py \
    --shapes 1024x128,2048x64 --chunk 128 --control unroll-kernel \
    2>&1 | grep -v WARNING | tail -4

echo "=== r5q2 done ==="
