#!/bin/bash
# Round-5 queue G: CLEAN re-measures (queue F's stages 4-5 were
# contaminated by concurrent compiler-crash bisection probes) + the
# parallel-grid-semantics headline.
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

echo "=== rG stage 1: flagship headline, parallel grid semantics ==="
$SG 1800 900 -- python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== rG stage 2: adaptive sweep b16384 (clean) ==="
$SG 3000 900 -- python -u tools/serving_runs.py --sweep-batch 16384 \
    --sweep-scan 4 --sweep-snrs "1.5,2" --frames 10000000 \
    2>&1 | grep -v WARNING | tail -4

echo "=== rG stage 3: layered n=8192 1M MC, MXU encode (clean) ==="
$SG 3000 1200 -- python -u tools/large_code_mc.py --skip-polar \
    --frames 1000000 --ldpc-snr -1.25 --ldpc-decoder nms \
    --ldpc-schedule layered 2>&1 | grep -v WARNING | tail -2

echo "=== rG stage 4: floor split, parallel semantics ==="
$SG 2400 900 -- python -u tools/scl_breakdown_probe.py \
    --N 1024 --L 8 --batch 4096 --chunk 128 --control unroll-kernel \
    --perm rank --leaf onehot \
    --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING

echo "=== rG stage 5: N=4096 live+matmul retry (wedge-risky, last) ==="
FEC_RANK_MATMUL_MIN_L=16 FEC_RANK_MATMUL_MIN_M=256 \
$SG 3000 1200 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --scan-chunks 8 \
    --out-name polar_n4096_scl32_live_mm.json 2>&1 | grep -v WARNING | tail -3

echo "=== rG done ==="
