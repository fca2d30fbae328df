#!/bin/bash
# Round-4 queue 5: flagship floor attribution + L=32 apply lever.
#  1. headline A/B after the int8-first descend beta applies (OPT-1)
#  2. per-chunk variant probe (kernel mode): where do the 6.9 ms go?
#  3. L=32 apply-form microbench (select-sum vs MXU one-hot matmul)
#  4. L=32 real-mask breakdown with the matmul apply enabled
set -x
cd /root/repo

echo "=== q5 stage 1: flagship headline post-OPT1 (4096x32 c128) ==="
timeout 1800 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -3

echo "=== q5 stage 2: per-chunk variant probe (kernel, real mask) ==="
timeout 3600 python -u tools/scl_variant_probe.py --batch 4096 \
    --mode kernel 2>&1 | grep -v WARNING

echo "=== q5 stage 3: L=32 apply microbench ==="
timeout 1200 python -u tools/apply_l32_ab.py --L 32 --M 512 --B 1024 \
    2>&1 | grep -v WARNING

echo "=== q5 stage 4: L=32 real-mask breakdown, matmul apply ==="
FEC_RANK_MATMUL_MIN_L=16 timeout 3600 python -u tools/scl_breakdown_probe.py \
    --N 4096 --L 32 --batch 1024 --chunk 128 --control unroll-fused \
    --perm rank --leaf sort --masks real_rate_half 2>&1 | grep -v WARNING

echo "=== q5 done ==="
