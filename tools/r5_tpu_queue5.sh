#!/bin/bash
# Round-5 queue 5: N=4096 SCL-32 lever confirmations (trimmed after the
# giant-XLA wedges + Pallas-body tracing cost ate queue 1/1b).
#  1. live + MXU matmul apply (M>=256) through the unroll-fused control,
#     chained-scan methodology
#  2. scan control=kernel at batch_tile 64 (small program; superkernels
#     where VMEM admits, XLA hybrid elsewhere)
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

echo "=== r5q5 stage 1: N=4096 live + matmul apply, chained ==="
FEC_RANK_MATMUL_MIN_L=16 FEC_RANK_MATMUL_MIN_M=256 \
$SG 4500 1200 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --scan-chunks 8 \
    --out-name polar_n4096_scl32_live_mm.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q5 stage 2: N=4096 scan control=kernel tile 64 ==="
$SG 5400 1200 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control kernel --body pallas \
    --mask-dedup union --batch-tile 64 \
    --out-name polar_n4096_scl32_kernel_t64.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q5 done ==="
