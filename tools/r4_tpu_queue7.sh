#!/bin/bash
# Round-4 queue 7: fused last-chunk butterfly + XLA packed bit-apply.
set -x
cd /root/repo

echo "=== q7 stage 0: int8 sublane-roll smoke ==="
timeout 600 python -u -c "
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 30, 0)
x = jnp.asarray(np.random.default_rng(0).integers(0,2,(32,128)), jnp.int8)
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec((32,128), lambda: (0,0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((32,128), lambda: (0,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((32,128), jnp.int8))(x)
print('int8 roll:', bool((np.asarray(out)==np.roll(np.asarray(x),30,0)).all()))
" 2>&1 | grep -v WARNING | tail -1

echo "=== q7 stage 1: hardware bit-match (full new path vs split/onehot) ==="
timeout 1800 python -u tools/scl_hw_bitmatch.py 2>&1 | grep -v WARNING | tail -3

echo "=== q7 stage 2: headline 4096x32 c128 (fused butterfly) ==="
timeout 1800 python -u tools/scl_batch_shape_ab.py --shapes 4096x32 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -2

echo "=== q7 stage 3: batch-shape re-check ==="
timeout 2400 python -u tools/scl_batch_shape_ab.py --shapes 8192x16,2048x64 \
    --chunk 128 --control unroll-kernel 2>&1 | grep -v WARNING | tail -3

echo "=== q7 done ==="
