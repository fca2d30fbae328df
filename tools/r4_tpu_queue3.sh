#!/bin/bash
# Round-4 queue 3: the N=4096 SCL-32 investigation (after r4_tpu_queue2.sh).
set -x
cd /root/repo

echo "=== q3 stage 0: flagship levelpar cap sweep (floor reclaim) ==="
for CAP in 16 32; do
  timeout 2400 env FEC_LEVELPAR_MAX=$CAP python -u tools/scl_breakdown_probe.py \
      --batch 4096 --chunk 128 --control unroll-kernel --perm rank \
      --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING | sed "s/^/CAP=$CAP /"
done

echo "=== q3 stage 1: L=32 breakdown (gather apply, sort leaf) ==="
timeout 3600 python -u tools/scl_breakdown_probe.py --N 4096 --L 32 \
    --batch 1024 --chunk 128 --control unroll-fused --perm rank --leaf sort \
    --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING

echo "=== q3 stage 2: L=32 breakdown with select-sum apply (gather OFF) ==="
timeout 3600 env FEC_RANK_GATHER_MIN_L=99 python -u tools/scl_breakdown_probe.py \
    --N 4096 --L 32 --batch 1024 --chunk 128 --control unroll-fused \
    --perm rank --leaf sort --masks real_rate_half 2>&1 | grep -v WARNING

echo "=== q3 stage 3: N=4096 artifact refresh (best known config) ==="
timeout 3000 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    2>&1 | grep -v WARNING | tail -3

echo "=== q3 done ==="

echo "=== q3 stage 4: N=4096 waterfall 1M MC (corrected Es/N0 scout grid) ==="
timeout 5400 python -u tools/large_code_mc.py --skip-ldpc \
    --polar-scout="-1.75,-1.5,-1.25,-1.0" --polar-max-errors 1000 \
    --scl-control unroll-fused --scl-chunk 128 2>&1 | grep -v WARNING | tail -10
