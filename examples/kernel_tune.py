"""Microbench the fused SCM sweep kernel at median-dataset scale.

Usage: python examples/kernel_tune.py [n_genomes n_kmers n_fits]
Tries a few block sizes and reports ms/pass + % of int8 MXU peak.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from grm_tpu.ops.pallas_scm_sweep import scm_utility_argmax_pallas

G = int(sys.argv[1]) if len(sys.argv) > 1 else 342
K = int(sys.argv[2]) if len(sys.argv) > 2 else 9_600_000
F = int(sys.argv[3]) if len(sys.argv) > 3 else 80

W = -(-G // 32)
rng = np.random.default_rng(0)
mat = jnp.asarray(rng.integers(0, 2**32, size=(W, K), dtype=np.uint32))
neg = jnp.asarray(rng.integers(0, 2**32, size=(F, W), dtype=np.uint32))
pos = jnp.asarray(rng.integers(0, 2**32, size=(F, W), dtype=np.uint32))
n_neg = jnp.full((F,), G // 2, jnp.float32)
n_pos = jnp.full((F,), G - G // 2, jnp.float32)
ps = jnp.linspace(0.1, 10.0, F, dtype=jnp.float32)

fp = max(-(-F // 16) * 16, 16)
w32p = -(-32 * W // 128) * 128
flops = 2 * (2 * fp) * w32p * K  # int8 MXU MACs*2 per pass
PEAK = 394e12  # v5e int8 OPS

for blk in (2048, 4096, 8192, 16384):
    try:
        out = scm_utility_argmax_pallas(
            mat, neg, pos, n_neg, n_pos, ps, n_kmers=K, block=blk)
        jax.block_until_ready(out)
        # The tunnel RTT dominates a single device_get; chain N dependent
        # passes (each pass's ps perturbed by the previous pass's output so
        # they serialize on device) and take the slope between 1 and N+1
        # passes, which cancels the RTT and any relay memoization.
        def chain(n, seed):
            psv = ps + jnp.float32(seed)
            o = None
            for _ in range(n):
                o = scm_utility_argmax_pallas(
                    mat, neg, pos, n_neg, n_pos, psv, n_kmers=K, block=blk)
                psv = ps + o[0] * jnp.float32(1e-12) + jnp.float32(seed)
            return o

        jax.device_get(chain(1, 0.5))  # warm compile
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            jax.device_get(chain(1, 0.01 * r))
        t1 = time.perf_counter()
        for r in range(reps):
            jax.device_get(chain(11, 0.02 * r))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (10 * reps)
        print(f"block={blk:6d}: {dt*1e3:8.2f} ms/pass  "
              f"{flops/dt/1e12:6.1f} TOPS ({100*flops/dt/PEAK:4.1f}% peak)  "
              f"{mat.nbytes/dt/2**30:6.1f} GiB/s matrix")
    except Exception as e:
        print(f"block={blk}: FAILED {type(e).__name__}: {str(e)[:200]}")
