#!/bin/bash
# Round-4 follow-up TPU queue (serial, after r4_tpu_queue.sh).
set -x
cd /root/repo

echo "=== q2 stage 0: N=4096 SCL-32 XLA unroll-fused (r4 rate0/REP/compose improvements) ==="
timeout 3000 python -u tools/large_code_runs.py polar4096 --batch 1024 \
    --chunk 128 --leaf sort --control unroll-fused --mask-dedup union \
    --out-name polar_n4096_scl32_r4probe.json 2>&1 | grep -v WARNING | tail -4

echo "=== q2 stage 1: hardware bit-match unroll-kernel vs unroll-fused (flagship) ==="
timeout 2400 python -u -c "
import numpy as np, jax, jax.numpy as jnp
from polarcode_and_ldpc_tpu.models.polar.construction import construct_polar_code, frozen_mask_from_positions
from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan
rng = np.random.default_rng(0)
N, K, L = 1024, 512, 8
mask = frozen_mask_from_positions(N, construct_polar_code(N, K)[0])
llr = jnp.asarray(rng.standard_normal((512, N)).astype(np.float32) * 2.0)
llr = llr.at[0, :3].set(0.0)
outs = {}
for ctrl in ('unroll-fused', 'unroll-kernel'):
    dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=128, control_impl=ctrl))
    u, m = dec(llr); outs[ctrl] = (np.asarray(u), np.asarray(m))
    print(ctrl, 'done', flush=True)
ok = (outs['unroll-fused'][0] == outs['unroll-kernel'][0]).all() and \
     (outs['unroll-fused'][1] == outs['unroll-kernel'][1]).all()
print('HW bit-exact kernel vs XLA (r4 leaf/REP/levelpar):', ok)
assert ok
" 2>&1 | grep -v WARNING | tail -4

echo "=== q2 stage 2: floor A/B — level-parallel ON vs OFF (all_frozen + real) ==="
timeout 2700 env FEC_LEVELPAR_MAX=1 python -u tools/scl_breakdown_probe.py \
    --batch 4096 --chunk 128 --control unroll-kernel --perm rank \
    --masks all_frozen,real_rate_half 2>&1 | grep -v WARNING

echo "=== q2 stage 3: layered artifacts (repacked kernel) ==="
timeout 4200 python -u tools/layered_runs.py 2>&1 | grep -v WARNING | tail -20

echo "=== q2 stage 4: nms vs bp bench re-measure (gap-probe follow-up) ==="
timeout 1800 python -u -c "
import bench, json
rb = bench.bench_ldpc_bp(decoder='bp')
rn = bench.bench_ldpc_bp(decoder='nms')
print('GAP-REMEASURE bp', round(rb['mbps'],1), 'nms', round(rn['mbps'],1))
import pathlib
p = pathlib.Path('results/tpu/minsum_gap_probe.json')
d = json.loads(p.read_text())
d['stage4_bench_remeasure'] = {'bp_mbps': round(rb['mbps'],1), 'nms_mbps': round(rn['mbps'],1),
  'note': 'same bench harness, same session as stages 1-3'}
p.write_text(json.dumps(d, indent=1))
" 2>&1 | grep -v WARNING | tail -3

echo "=== q2 stage 5: serving sweep (single-program adaptive) ==="
timeout 4200 python -u tools/serving_runs.py --frames 10000000 2>&1 | grep -v WARNING | tail -12

echo "=== q2 stage 6: N=4096 million-frame MC in the waterfall (scouted) ==="
timeout 4800 python -u tools/large_code_mc.py --skip-ldpc \
    --polar-scout="-0.5,-0.25,0.0,0.25" --scl-control unroll-fused \
    --scl-chunk 128 2>&1 | grep -v WARNING | tail -8

echo "=== q2 done ==="
