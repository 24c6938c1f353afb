"""TPU spot check: per-node-priors CART frontier kernel vs XLA scorer,
plus batched-forest vs per-tree pass timing at a realistic frontier size."""
import time

import numpy as np
import jax

from grm_tpu.ops.popcount import BitMatrix
from grm_tpu.parallel.cart_device import cart_frontier_splits_device

G, K = 342, 2_000_000
rng = np.random.default_rng(0)
dense = (rng.random((G, K)) > 0.5).astype(np.uint8)
bm = BitMatrix.from_dense(dense)

idx = np.arange(G)
y = rng.integers(0, 2, size=G)
N = 48
nodes, priors, totals = [], [], []
for i in range(N):
    sel = idx[rng.random(G) > 0.3]
    nodes.append({c: sel[y[sel] == c] for c in range(2)})
    a = 0.2 + 0.6 * rng.random()
    priors.append({0: a, 1: 1 - a})
    totals.append({0: float((y == 0).sum()), 1: float((y == 1).sum())})

want = cart_frontier_splits_device(bm, nodes, priors, totals, "gini",
                                   sweep="xla")
got = cart_frontier_splits_device(bm, nodes, priors, totals, "gini",
                                  sweep="pallas")
bad = 0
for (wi, ws), (gi, gs) in zip(want, got):
    if wi != gi or not np.isclose(ws, gs, rtol=1e-4):
        bad += 1
        print("MISMATCH", wi, gi, ws, gs)
print(f"per-node priors kernel: {N - bad}/{N} nodes match the XLA scorer")

def timed(fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps

t_batched = timed(lambda: cart_frontier_splits_device(
    bm, nodes, priors, totals, "gini", sweep="pallas"))
t_per_tree = timed(lambda: [
    cart_frontier_splits_device(
        bm, nodes[i * 16:(i + 1) * 16], priors[i * 16:(i + 1) * 16],
        totals[i * 16:(i + 1) * 16], "gini", sweep="pallas")
    for i in range(3)
])
print(f"one batched 48-node pass: {t_batched*1e3:.1f} ms; "
      f"3 separate 16-node passes: {t_per_tree*1e3:.1f} ms "
      f"({t_per_tree/t_batched:.2f}x)")
