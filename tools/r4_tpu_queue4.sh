#!/bin/bash
# Round-4 queue 4: clean L=32 measurements (gather default reverted).
set -x
cd /root/repo

echo "=== q4 stage 1: clean L=32 breakdown (select-sum apply) ==="
timeout 3600 python -u tools/scl_breakdown_probe.py --N 4096 --L 32 \
    --batch 1024 --chunk 128 --control unroll-fused --perm rank --leaf sort \
    --masks all_frozen,all_info 2>&1 | grep -v WARNING

echo "=== q4 stage 2: N=4096 waterfall 1M MC (select-sum) ==="
timeout 5400 python -u tools/large_code_mc.py --skip-ldpc \
    --polar-scout="-1.75,-1.5,-1.25,-1.0" --polar-max-errors 1000 \
    --scl-control unroll-fused --scl-chunk 128 2>&1 | grep -v WARNING | tail -12

echo "=== q4 stage 3: N=4096 artifact refresh ==="
timeout 3000 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    2>&1 | grep -v WARNING | tail -3

echo "=== q4 done ==="
