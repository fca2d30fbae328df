#!/bin/bash
# Round-5 queue 7: batch-tile sweep — the floor hypothesis is SERIAL
# per-tile latency (the grid walks 32 tiles sequentially; each tile's
# dependent chain runs on 1-vreg [8,128] ops with the VPU ~90% idle).
# Wider tiles = fewer serial repeats at similar per-tile latency.
# r3 saw tile=256 abort the compiler; retry on the r5 tree (slim state,
# live width) under stallguard.
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

for TILE in 256 512; do
  echo "=== r5q7: flagship 4096x32 c128 batch_tile $TILE ==="
  $SG 2400 900 -- python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
      --chunk 128 --control unroll-kernel --batch-tile $TILE \
      2>&1 | grep -v WARNING | tail -2
done

echo "=== r5q7: floor split at the best tile (256) ==="
$SG 3600 900 -- python -u tools/scl_breakdown_probe.py \
    --N 1024 --L 8 --batch 4096 --chunk 128 --control unroll-kernel \
    --perm rank --leaf onehot --batch-tile 256 \
    --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING

echo "=== r5q7: adaptive sweep at batch 16384 (amortize fixed cost) ==="
# the b8192 sweep reached 1081 Mbps at 0% fallback (target >= 1150);
# SC+CRC at b16384 runs 6.29 ms -> the ~0.7 ms cond/count overhead
# amortizes to ~1180 effective
$SG 4500 900 -- python -u tools/serving_runs.py --sweep-batch 16384 \
    --sweep-scan 4 --sweep-snrs "1.5,2" --frames 10000000 \
    2>&1 | grep -v WARNING | tail -8

echo "=== r5q7: layered n=8192 million-frame MC, MXU encode ==="
# the first run measured 44.1 Mbps e2e with the encode matmul running
# int32x:int32 off-MXU; re-measure with the s8xs8->s32 MXU encode
$SG 4500 1200 -- python -u tools/large_code_mc.py --skip-polar \
    --frames 1000000 --ldpc-snr -1.25 --ldpc-decoder nms \
    --ldpc-schedule layered 2>&1 | grep -v WARNING | tail -4

echo "=== r5q7 done ==="
