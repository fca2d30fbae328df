#!/bin/bash
# Round-4 serial TPU measurement queue (one chip — jobs must not overlap).
# Each stage has its own timeout so a tunnel stall can't eat the round;
# artifacts land incrementally under results/tpu/.
set -x
cd /root/repo

echo "=== stage 1: SCL breakdown probe (c128 unroll-kernel rank) ==="
timeout 3000 python -u tools/scl_breakdown_probe.py --batch 4096 --chunk 128 \
    --control unroll-kernel --perm rank 2>&1 | grep -v WARNING

echo "=== stage 2: flagship bench re-measure ==="
timeout 1500 python -u -c "
import bench
r = bench.bench_polar_scl8(batch=4096, control_impl='unroll-kernel', chunk=128, scan_chunks=32)
print('FLAGSHIP', r['mbps'], 'Mbps, BER', r['ber_3db'])
" 2>&1 | grep -v WARNING | tail -4

echo "=== stage 3: minsum gap probe ==="
timeout 2400 python -u tools/minsum_gap_probe.py 2>&1 | grep -v WARNING | tail -15

echo "=== stage 4: layered min-sum artifacts ==="
timeout 4200 python -u tools/layered_runs.py 2>&1 | grep -v WARNING | tail -25

echo "=== stage 5: N=4096 SCL-32 unroll-kernel + union dedup (compile-wall attack) ==="
timeout 5400 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-kernel --mask-dedup union \
    2>&1 | grep -v WARNING | tail -6

echo "=== queue done ==="
