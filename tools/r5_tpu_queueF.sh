#!/bin/bash
# Round-5 FINAL queue — prioritized by VERDICT demand value vs time left.
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

echo "=== rF stage 1: N=4096 live + matmul apply, chained ==="
FEC_RANK_MATMUL_MIN_L=16 FEC_RANK_MATMUL_MIN_M=256 \
$SG 3600 1200 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --scan-chunks 8 \
    --out-name polar_n4096_scl32_live_mm.json 2>&1 | grep -v WARNING | tail -3

echo "=== rF stage 2: flagship batch_tile 256 ==="
$SG 2400 900 -- python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel --batch-tile 256 \
    2>&1 | grep -v WARNING | tail -2

echo "=== rF stage 3: flagship batch_tile 512 ==="
$SG 2400 900 -- python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel --batch-tile 512 \
    2>&1 | grep -v WARNING | tail -2

echo "=== rF stage 4: adaptive sweep b16384 ==="
$SG 4500 900 -- python -u tools/serving_runs.py --sweep-batch 16384 \
    --sweep-scan 4 --sweep-snrs "1.5,2" --frames 10000000 \
    2>&1 | grep -v WARNING | tail -6

echo "=== rF stage 5: layered n=8192 1M MC, MXU encode ==="
$SG 4500 1200 -- python -u tools/large_code_mc.py --skip-polar \
    --frames 1000000 --ldpc-snr -1.25 --ldpc-decoder nms \
    --ldpc-schedule layered 2>&1 | grep -v WARNING | tail -3

echo "=== rF stage 6: floor split at best tile ==="
$SG 3600 900 -- python -u tools/scl_breakdown_probe.py \
    --N 1024 --L 8 --batch 4096 --chunk 128 --control unroll-kernel \
    --perm rank --leaf onehot --batch-tile 256 \
    --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING

echo "=== rF done ==="
