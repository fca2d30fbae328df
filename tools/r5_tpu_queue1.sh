#!/bin/bash
# Round-5 queue 1: the N=4096 SCL-32 levers (VERDICT r4 demand #1).
#  1. apply-form microbench M-sweep: where does the MXU one-hot matmul
#     beat the select-sum? (decides FEC_RANK_MATMUL_MIN_M)
#  2. committed-config floor split (all_frozen / real / all_info) —
#     the evidence anchor q4/q5 never finished
#  3. full-decode A/B with the matmul apply gated to wide planes
#  4. per-variant Pallas chunk bodies (body=pallas) under mask_dedup=union
set -x
cd /root/repo

echo "=== r5q1 stage 1: apply M-sweep (L=32, B=1024) ==="
for M in 1 4 16 64 128 256 512 2048; do
  timeout 600 python -u tools/apply_l32_ab.py --L 32 --M $M --B 1024 \
      2>&1 | grep -v WARNING
done

echo "=== r5q1 stage 2: committed-config floor split ==="
timeout 5400 python -u tools/scl_breakdown_probe.py \
    --N 4096 --L 32 --batch 1024 --chunk 128 --control unroll-fused \
    --perm rank --leaf sort --mask-dedup union \
    --masks all_frozen,real_rate_half,all_info 2>&1 | grep -v WARNING

echo "=== r5q1 stage 3a: full decode, matmul apply M>=256 ==="
FEC_RANK_MATMUL_MIN_L=16 FEC_RANK_MATMUL_MIN_M=256 \
timeout 3600 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --out-name polar_n4096_scl32_mmM256.json 2>&1 | grep -v WARNING | tail -2

echo "=== r5q1 stage 3b: full decode, matmul apply M>=1024 ==="
FEC_RANK_MATMUL_MIN_L=16 FEC_RANK_MATMUL_MIN_M=1024 \
timeout 3600 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --out-name polar_n4096_scl32_mmM1024.json 2>&1 | grep -v WARNING | tail -2

echo "=== r5q1 stage 4: per-variant Pallas bodies ==="
timeout 5400 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --body pallas \
    --mask-dedup union \
    --out-name polar_n4096_scl32_pbody.json 2>&1 | grep -v WARNING | tail -2

echo "=== r5q1 done ==="
