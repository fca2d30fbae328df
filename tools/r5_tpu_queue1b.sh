#!/bin/bash
# Round-5 queue 1b: N=4096 SCL-32 levers, re-planned after two giant
# unroll-fused XLA programs wedged the axon tunnel (client frozen in
# tcp_recvmsg 12-22+ min while fresh connections worked; killed).
# Strategy: SMALL-program configs first (Pallas bodies / scan controls),
# giant-XLA retries last, everything under stallguard.
set -x
cd /root/repo
SG="bash tools/stallguard.sh"

echo "=== r5q1b stage A: per-variant Pallas bodies (small XLA glue) ==="
$SG 5400 900 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --body pallas \
    --mask-dedup union \
    --out-name polar_n4096_scl32_pbody.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q1b stage A2: Pallas bodies, batch_tile 64 (VMEM headroom) ==="
$SG 5400 900 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --body pallas \
    --mask-dedup union --batch-tile 64 \
    --out-name polar_n4096_scl32_pbody_t64.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q1b stage B: scan control=kernel, tile 64 (superkernels) ==="
$SG 5400 900 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control kernel --body pallas \
    --mask-dedup union --batch-tile 64 \
    --out-name polar_n4096_scl32_kernel_t64.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q1b stage C: matmul-apply giant-XLA retry (stallguarded) ==="
FEC_RANK_MATMUL_MIN_L=16 FEC_RANK_MATMUL_MIN_M=256 \
$SG 3600 900 -- python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --out-name polar_n4096_scl32_mmM256.json 2>&1 | grep -v WARNING | tail -3

echo "=== r5q1b done ==="
